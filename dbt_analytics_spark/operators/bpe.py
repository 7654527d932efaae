"""Distributed BPE tokenizer training and application.

Sennrich-style byte-pair-encoding merge learning (the algorithm behind
GPT-2/RoBERTa vocabularies), Spark-first:

- The corpus is scanned ONCE: BPE training operates on the word-FREQUENCY
  table (word type → count), which is vocabulary-bounded — millions of
  rows for a web corpus, not billions. That table is what iterates.
- Each merge round is one pair-count aggregation over the (small) word
  table + an argmax + a JVM-side fold rewriting the symbol arrays. The
  per-round table is localCheckpointed (the dd7 lineage pattern).
- Applying a learned merge list to documents is an Arrow-batched
  ``mapInPandas`` pass with a per-partition word cache — the corpus never
  shuffles for segmentation.

Determinism: merge selection breaks ties on (count desc, left asc,
right asc), so the learned merge list is a pure function of the corpus.
Reference: no analog in the reference repo (SURVEY.md §2 "not present");
this extends the txt5 BPE-ish pretokenizer into real tokenizer training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

#: End-of-word sentinel (Sennrich's </w>): lets merges distinguish
#: word-final from word-internal occurrences.
EOW = "</w>"


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) — the one corpus-wide shuffle BPE training needs."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word type into single-character symbols + EOW."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def _merge_pair_in_syms(left: str, right: str):
    """Column expr: greedy left-to-right single-pair merge via one
    ``aggregate`` fold over the symbol array (JVM-side; the word table is
    vocabulary-bounded so the interpreted HOF is off the corpus hot
    path). "aaa" + (a,a) → [aa, a], matching the reference greedy scan."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (x == r)
            # Guard: element_at(-1) must be an UNMERGED l. After a merge
            # the accumulator tail is the fused token l||r, which only
            # equals l if r is empty — impossible (symbols are non-empty).
            ,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    max_word_chars: int = 256,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list [(left, right, weighted_pair_count), ...].

    Scale shape (100 TB): ONE corpus shuffle (the word-frequency groupBy,
    map-side partial); every round after that touches only the
    vocabulary-bounded word table — pair counts are a posexplode+lead
    window over word types weighted by freq (linear, the txt10-safe
    formulation), the argmax is a 1-row TakeOrdered, and the rewrite is a
    JVM fold. The driver holds n_merges rows, never data. Each round's
    checkpoint unpersists the previous one, so executor storage holds ONE
    copy of the symbol table, not ``n_merges``.

    ``max_word_chars``: the fold rewrite copies the accumulator per
    element (O(len²) per word per round), so one pathological unbroken
    token — a megabyte base64/DNA blob with no whitespace — would
    serialize a quadratic task every round. Word types longer than this
    are excluded from training (the HuggingFace
    ``max_input_chars_per_word`` convention); ``bpe_segment`` mirrors the
    cap by emitting such words unsplit.
    """
    if n_merges < 1:
        raise ValueError(f"bpe_train: n_merges must be >= 1, got {n_merges}")
    words = word_freq_table(docs, text_col).filter(
        F.length("word") <= max_word_chars
    )
    syms = _initial_symbols(words).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    wlead = Window.partitionBy("word").orderBy("pos")
    for _ in range(n_merges):
        pairs = (
            syms.select(
                "word", "freq", F.posexplode("syms").alias("pos", "s")
            )
            .withColumn("nxt", F.lead("s").over(wlead))
            .filter(F.col("nxt").isNotNull())
            .groupBy("s", "nxt")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("s"), F.asc("nxt")
        ).limit(1).collect()
        if not top or top[0]["n"] <= 0:
            break
        left, right, n = top[0]["s"], top[0]["nxt"], int(top[0]["n"])
        merges.append((left, right, n))
        prev = syms
        syms = prev.select(
            "word", "freq", _merge_pair_in_syms(left, right).alias("syms")
        ).localCheckpoint()
        prev.unpersist()
    return merges


def _apply_merges_to_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference-greedy application of an ordered merge list to one word."""
    s = list(word) + [EOW]
    for left, right in merges:
        out: list[str] = []
        for x in s:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        s = out
    return s


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_chars: int = 256,
) -> DataFrame:
    """Apply a learned merge list: (id, n_words, n_bpe_tokens,
    bpe_tokens array). Arrow-batched ``mapInPandas`` with the merge list
    in the task closure and a per-partition word→segmentation cache — the
    corpus never shuffles, and repeated word types cost one segmentation
    each per partition. NULL-text documents emit (id, 0, 0, []); words
    over ``max_word_chars`` (excluded from training — see ``bpe_train``)
    pass through unsplit as ``word + EOW``."""
    import pandas as pd

    rules = [(m[0], m[1]) for m in merges]
    id_type = docs.schema[id_col].dataType.simpleString()
    data = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("words"),
    )

    def segment(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_words, n_toks, toks_col = [], [], [], []
            for i, words in zip(pdf["id"], pdf["words"]):
                toks: list[str] = []
                n_w = 0
                for w in words if words is not None else []:
                    if not w:
                        continue
                    n_w += 1
                    if len(w) > max_word_chars:
                        toks.append(w + EOW)
                        continue
                    seg = cache.get(w)
                    if seg is None:
                        seg = _apply_merges_to_word(w, rules)
                        cache[w] = seg
                    toks.extend(seg)
                ids.append(i)
                n_words.append(n_w)
                n_toks.append(len(toks))
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "bpe_tokens": toks_col,
                }
            )

    return data.mapInPandas(
        segment,
        f"id {id_type}, n_words int, n_bpe_tokens int, bpe_tokens array<string>",
    )
