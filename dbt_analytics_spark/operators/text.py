"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen) — language ID, quality
scoring, token counting, and document fingerprinting run at full scan speed
with no Python in the hot path. Extension set beyond the reference surface
(BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny built-in stopword/marker lists for the language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "los", "de", "que", "y", "en"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "de", "et", "un", "est"),
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization over a normalized string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(c, r"\s+", " ")), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


#: GPT-2-style pretokenizer pattern: contraction suffixes, space-prefixed
#: letter/digit runs, space-prefixed punctuation runs. Valid and
#: match-identical in Java regex (Spark) and RE2 (DuckDB oracle).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pretokenization (the merge step of a real BPE runs on these
    pretokens; counting them is the standard fast token estimate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def _in_markers(markers: tuple[str, ...]):
    """Single-arg lambda factory (pyspark higher-order functions infer lambda
    arity from the signature, so default-arg closures are not usable)."""
    return lambda t: t.isin(*markers)


def marker_hits(col: Column | str, markers: tuple[str, ...]) -> Column:
    """Occurrences (with multiplicity) of marker words in the token stream."""
    toks = tokens(col)
    return F.size(F.filter(toks, _in_markers(markers)))


def stopword_ratio(col: Column | str, markers: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def _toks_column_barrier(df: DataFrame, text_col: str) -> DataFrame:
    """Materialize the token array ONCE as a real column, behind a
    pushdown/collapse barrier.

    The metric expressions built over it reference the array many times
    (sizes, distinct, HOF marker filters). Left as one projection over
    ``tokens(text)``, two optimizer behaviors each multiply the whole
    tokenize chain — plus everything BELOW it, e.g. the 10-pattern PII
    redaction a pipeline feeds in — per consumer expression:

    - predicate pushdown (``PushPredicateThroughNonJoin``) substitutes
      alias definitions into every pushed conjunct, re-inlining the full
      chain per conjunct across optimizer iterations until fixpoint
      (measured on the 500k-doc corpus: quality 15.7 s -> quality +
      ``keep_quality`` filter 107 s, plan regexp_replace node count 81);
    - the CodegenFallback higher-order filters (stopword/marker counts)
      evaluate their child interpreted, OUTSIDE whole-stage-codegen
      subexpression elimination, so they re-run the chain even when the
      codegen'd siblings share it.

    The ``spark_partition_id() >= 0`` guard is value-identical (the id
    is always >= 0, so the branch always yields the token array,
    including NULL for NULL text) but marks the projection
    non-deterministic, which lawfully blocks both rewrites: predicates
    stop ABOVE this projection (pushed conjuncts then reference only the
    cheap materialized array), and ``CollapseProject`` cannot inline it
    into consumers. Same optimizer-duplication class as the guide's
    "mark expensive UDFs non-deterministic" pattern, applied to a
    built-in expression chain."""
    return df.withColumn(
        "__toks",
        F.when(F.spark_partition_id() >= F.lit(0), tokens(F.col(text_col))),
    )


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach standard quality-scoring columns: token counts, type-token
    ratio, stopword ratio, mean token length, and a boolean keep flag.

    The thresholds mirror common pretraining-corpus filters (Gopher-style
    length / repetition rules), kept simple and fully declarative.
    Tokenization runs exactly once per row (see _toks_column_barrier).
    """
    base = _toks_column_barrier(df, text_col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col(text_col))
    ttr = F.when(n_tok > 0, n_uniq.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(toks, _in_markers(STOPWORDS)))
    stop_r = F.when(
        n_tok > 0, stop_hits.cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tok > 0,
        (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    keep = (n_tok >= 10) & (ttr >= 0.1) & (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    return base.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        ttr.alias("type_token_ratio"),
        stop_r.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        keep.alias("keep_quality"),
    )


def langid_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic n-gram/marker language ID: score each candidate language by
    marker-token density; argmax wins (ties broken by language code order);
    all-zero scores → 'und'.
    """
    base = _toks_column_barrier(df, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    scores = {
        lang: F.size(F.filter(toks, _in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax via chained comparisons over a fixed language order (deterministic).
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    density = F.when(n > 0, best_score.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return base.select(
        *df.columns,
        best_lang.alias("pred_lang"),
        best_score.cast("int").alias("marker_hits"),
        density.alias("marker_density"),
    )


#: PII patterns, ordered most-specific → least-specific so earlier
#: redactions can't be re-matched by later (broader) patterns. Every
#: pattern is valid AND match-identical in Java regex (Spark) and RE2
#: (DuckDB oracle): no lookaround, no backreferences, ASCII \b only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}([- ]\d{4}){3}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (non-overlapping, counted on the RAW text
    before any redaction — the audit signal a curation pipeline logs)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Chained JVM-side ``regexp_replace`` redaction of emails, credit-card
    numbers, SSNs, phone numbers, and IPv4 addresses. Pure Column
    expression — runs at scan speed inside whole-stage codegen; at 100 TB
    this is a map-only pass with zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping context-window chunks of
    ``chunk_size`` tokens advancing by ``stride`` (the standard prep for
    fixed-context training): every token lands in at least one chunk, and
    consecutive chunks overlap by ``chunk_size - stride`` tokens.

    Emits (id, chunk_idx, n_chunk_tokens, chunk_text). All JVM-side —
    tokenize, ``sequence``/``explode`` for chunk indices, ``slice`` +
    ``array_join`` for the windows; a map-side one-to-many flatMap with no
    shuffle, so it scales linearly with corpus bytes.
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    # Materialize the token array once (see _toks_column_barrier): the
    # generator's chunk-count bound and the window slices below both
    # need it, and the Project and Generate operators do not share
    # subexpressions — left inline, tokenization ran twice per document.
    base = _toks_column_barrier(df, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - chunk_size).cast("double") / F.lit(float(stride))).cast("long")
        + 1
    )
    chunked = base.select(
        F.col(id_col),
        toks,
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_idx").cast("int") * stride + 1, chunk_size
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(window).cast("int").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def fingerprint(col: Column | str, sort_tokens: bool = True) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (catches shuffled/duplicated content that exact hashing misses).
    """
    toks = tokens(col)
    basis = F.array_sort(F.array_distinct(toks)) if sort_tokens else toks
    return F.md5(F.concat_ws(" ", basis))


def exact_fingerprint(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the whitespace-normalized,
    lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance search: top-k documents for a bag of query
    terms. Returns (doc_id, n_hit_terms, score, rank).

    Scale shape (100 TB): the query-term list is a broadcast literal, so
    the corpus-side explode is filtered to query terms BEFORE any shuffle
    (candidate rows ≈ |docs matching a term|, not |tokens|). Per-doc
    length and the global avgdl are one partial-agg pass; per-term df is a
    |terms|-row aggregate broadcast back. The final top-k is a
    TakeOrdered, never a full sort.

    Cross-engine float note: term scores involve ln(), which libm vs JVM
    may differ on by 1 ULP, and the per-doc sum over matched terms has no
    defined order — the returned ``score`` is therefore rounded to 6
    decimals and ranking orders by the ROUNDED score (ties → doc id), so
    results are stable and the DuckDB oracle (txt12) hashes exactly.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25_topk: duplicate query terms")

    toks = tokens(F.lower(F.col(text_col)))
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").cast("double").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    hits = per_doc.filter(F.col("term").isin(list(query_terms)))

    stats = docs.select(toks.alias("__toks")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )

    tf = hits.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score"),
        F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
    )
    return (
        agg.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            ).cast("int"),
        )
        .select("doc_id", "n_hit_terms", "score", "rank")
    )


def _doc_bigrams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    segment_tokens: int | None = None,
) -> DataFrame:
    """(id, w, nxt, gram) — one row per word bigram, linear per doc.

    posexplode + lead, NOT explode(transform(...)): Generate re-evaluates
    a non-attribute child per OUTPUT row, so an interpreted HOF bigram
    array is O(len^2) per doc (the txt10 trap, BENCH_NOTES.md round 5).

    ``segment_tokens`` is the long-document window-skew guard (see
    ``dedup.gram_rows``): the window keys on ``(id, pos div S)`` with each
    segment's first token row carried back into the previous segment, so
    the boundary bigram still assembles — row-identical output for any
    S >= 2, and a pathological giant doc parallelizes across segments.
    """
    base = docs.select(
        F.col(id_col).alias("__id"), tokens(F.lower(F.col(text_col))).alias("__toks")
    ).select("__id", F.posexplode("__toks").alias("pos", "w"))
    if segment_tokens is None:
        w = Window.partitionBy("__id").orderBy("pos")
        keyed = base
    else:
        if segment_tokens < 2:
            raise ValueError(
                f"_doc_bigrams: segment_tokens ({segment_tokens}) must be >= 2"
            )
        from .util import segment_window

        # carry = k - 1 = 1 boundary row per segment for bigrams.
        keyed, w = segment_window(base, ["__id"], segment_tokens, 1)
    out = keyed.withColumn("nxt", F.lead("w").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    if segment_tokens is not None:
        out = out.filter(F.col("__back") == 0)
    return out.select(
        "__id", "w", "nxt", F.concat_ws(" ", "w", "nxt").alias("gram")
    )


def bigram_lm_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_tokens: int | None = None,
) -> DataFrame:
    """Perplexity-proxy quality scoring: fit an add-one-smoothed word-bigram
    language model on ``train`` and score every ``score`` document by its
    mean bigram log-probability. Returns (doc_id, n_bigrams, avg_logp);
    docs with fewer than two tokens have no bigrams and are omitted.

      P(nxt | w) = (c2(w, nxt) + 1) / (c1(w) + V)

    with c2 = train bigram count, c1 = train count of w as a bigram HEAD
    (so sum_x c2(w, x) = c1(w) exactly), V = distinct successor vocabulary.
    Low avg_logp flags boilerplate-free but incoherent/garbage text that
    repetition metrics (txt10) miss; a standard corpus-quality filter
    alongside heuristic scoring.

    Scale shape (100 TB): the model tables are vocabulary-bounded (c2 at
    most V^2 rows, c1 at most V) and build in one partial-agg pass over the
    train corpus each. Scoring joins the skinny (id, gram) stream against
    c2/c1 on the gram/head key — a shuffle join AQE downgrades to broadcast
    whenever the model fits (it does for any curated vocabulary) — then one
    partial-agg groupBy on the doc id. No Python anywhere; every expression
    is codegen.

    Cross-engine float note: ln() may differ by 1 ULP across libms and the
    per-doc mean has no defined summation order, so ``avg_logp`` is rounded
    to 6 decimals (the txt12/BM25 convention) and the DuckDB oracle hashes
    exactly.

    Precondition: ``train`` must contain at least one bigram (a document
    with >= 2 tokens) — an empty model has V = 0 and every smoothed
    probability degenerates to 1/0 (scores come back infinite).
    """
    # ONE pass over the train corpus: the (w, nxt, gram) rollup is
    # vocabulary-bounded (<= V^2 rows) and localCheckpointed (the dd7
    # pattern — Spark evaluates each DataFrame subtree independently, so
    # without it c1 / v_size / the score join would each re-tokenize the
    # whole corpus; measured 4 scans -> 2). c1(w) = sum_x c2(w, x) and
    # V = distinct nxt re-aggregate from the materialized model exactly
    # as before.
    c2 = (
        _doc_bigrams(train, id_col, text_col, segment_tokens)
        .groupBy("w", "nxt", "gram")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint()
    )
    # Long-sum audit: c1 sums bigram counts, bounded by total corpus
    # tokens <= corpus bytes (~2^47 at 100 TB) << 2^63 — no guard needed.
    c1 = c2.groupBy("w").agg(F.sum("c2").alias("c1"))
    vocab = c2.agg(
        F.count_distinct(F.col("nxt")).cast("double").alias("v_size")
    )
    c2 = c2.select("gram", "c2")
    scored = (
        _doc_bigrams(score, id_col, text_col, segment_tokens)
        .join(c2, "gram", "left")
        .join(c1, "w", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.col("v_size"))
            ),
        )
    )
    return scored.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    broadcast_model: bool = True,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained and applied as pure
    aggregations — the distributed, fully deterministic counterpart of a
    fastText-style quality/language classifier in a curation pipeline.

    Train: per-label doc priors and add-one-smoothed token likelihoods
      P(w | l) = (c(w, l) + 1) / (tot_tokens(l) + V),  V = train vocabulary.
    Predict: argmax_l  ln P(l) + sum_w n_w(doc) * ln P(w | l), scores
    rounded to 6 decimals BEFORE the argmax (ties then break on label asc),
    which makes the prediction stable across engines/libms.

    Returns (id, label_col actual, predicted, score, correct).

    Scale shape (100 TB): model tables are (V × |labels|)-bounded; training
    is one partial-agg pass over the train tokens. Scoring streams the
    skinny (id, word, cnt) tokens through a broadcast of the per-label
    metadata and a key join against the likelihood table, then one groupBy
    on (id) — no Python, all codegen. The |labels|-way fan-out happens on
    the REDUCED (id, word, cnt) rows, not raw tokens.
    """
    # ONE tokenize pass over the train corpus: the (label, word) rollup is
    # (V × |labels|)-bounded and localCheckpointed (see bigram_lm_score —
    # without it tot_l and v_size would each re-tokenize the corpus);
    # tot_l = sum(c) and V = distinct w re-aggregate from it exactly.
    likelihood = (
        train.select(
            F.col(label_col).alias("__lbl"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
        )
        .groupBy("__lbl", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    label_meta = (
        train.groupBy(F.col(label_col).alias("__lbl"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs_l"))
        .crossJoin(
            F.broadcast(
                train.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
            )
        )
        .join(
            likelihood.groupBy("__lbl").agg(
                F.sum("c").cast("double").alias("tot_l")
            ),
            "__lbl",
        )
        .crossJoin(
            F.broadcast(
                likelihood.agg(
                    F.count_distinct("w").cast("double").alias("v_size")
                )
            )
        )
        .select(
            "__lbl",
            F.log(F.col("n_docs_l") / F.col("n_docs")).alias("ln_prior"),
            "tot_l",
            "v_size",
        )
    )
    te_counts = (
        test.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).alias("__actual"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
        )
        .groupBy("__id", "__actual", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    # The model table is (V x |labels|)-bounded; for language-ID-sized
    # vocabularies it broadcasts (default), keeping scoring entirely
    # map-side — the likelihood join was the one shuffle in the scoring
    # path (sf1 probe: 3.1 s -> broadcast removes the contrib exchange).
    # Pass broadcast_model=False for corpora whose vocabulary genuinely
    # exceeds broadcast size; the key join then shuffles the REDUCED
    # (id, word, cnt) rows, never raw tokens.
    model = F.broadcast(likelihood) if broadcast_model else likelihood
    contrib = (
        te_counts.crossJoin(F.broadcast(label_meta))
        .join(model, ["__lbl", "w"], "left")
        .withColumn(
            "logp",
            F.col("cnt")
            * F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("tot_l") + F.col("v_size"))
            ),
        )
    )
    scores = contrib.groupBy("__id", "__actual", "__lbl").agg(
        F.round(F.first("ln_prior") + F.sum("logp"), 6).alias("score")
    )
    # Argmax as a partial-aggregable struct-min instead of a ranking
    # window: min over (-score, label) is exactly (score DESC, label ASC)
    # on the ROUNDED score, so the prediction contract is unchanged — but
    # the plan drops the window's extra exchange + per-partition sort
    # (sf1 probe: scoring path 2.8 s -> 1.2 s). Scores are strictly
    # negative (log-likelihood + negative prior), so the -0.0 edge of the
    # negation cannot occur.
    return (
        scores.groupBy("__id", "__actual")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("__lbl").alias("l"),
                    F.col("score").alias("s"),
                )
            ).alias("b")
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__actual").alias(label_col),
            F.col("b.l").alias("predicted"),
            F.col("b.s").alias("score"),
            (F.col("b.l") == F.col("__actual")).alias("correct"),
        )
    )


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-k terms via per-partition SpaceSaving sketches —
    the mergeable, map-side-bounded alternative to the exact full-vocab
    shuffle (txt11) for corpora whose vocabulary does NOT fit a shuffle.
    Returns (term, est_count, err_bound, rank) with the two-sided merged
    guarantee  est_count - err_bound <= true_count <= est_count.

    Merged-sketch accounting (Metwally et al.'s SpaceSaving per
    partition): within one partition, a tracked term's count is
    overestimated by at most its stored err, and an UNTRACKED term's
    count is at most the partition's final minimum counter (its "floor";
    0 if the sketch never filled). Summing naive per-partition estimates
    can therefore UNDERestimate a term evicted from some partitions, so
    the merge adds every non-tracking partition's floor:

        est_count = sum_tracked(est) + sum_untracked(floor)   # >= true
        lower     = sum_tracked(est - err)                    # <= true

    and err_bound = est_count - lower. Each partition emits one marker
    row carrying its floor to make the untracked sum computable.

    Scale shape (100 TB): token rows never shuffle — each partition folds
    its token stream into a ``capacity``-entry dict inside one
    ``mapInPandas`` pass and emits at most ``capacity`` + 1 skinny rows;
    the only shuffle is the |partitions| × capacity sketch merge,
    independent of corpus size. Determinism: per-partition stream order
    is fixed for a fixed input/plan, so results are run-to-run stable.
    """
    import pandas as pd

    if capacity < k:
        raise ValueError(
            f"heavy_hitters: capacity ({capacity}) must be >= k ({k})"
        )

    toks = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")

    def sketch(batches):
        counts: dict[str, list] = {}  # term -> [est, err]
        seen = False
        for pdf in batches:
            for term in pdf["term"]:
                seen = True
                if term in counts:
                    counts[term][0] += 1
                elif len(counts) < capacity:
                    counts[term] = [1, 0]
                else:
                    # Evict the minimum counter; inherit its estimate as
                    # the new term's error bound (the SpaceSaving step).
                    victim = min(counts, key=lambda t: counts[t][0])
                    v_est = counts.pop(victim)[0]
                    counts[term] = [v_est + 1, v_est]
        if seen:
            # Floor: max possible count of a term NOT in this sketch.
            floor = (
                min(v[0] for v in counts.values())
                if len(counts) >= capacity
                else 0
            )
            yield pd.DataFrame(
                {
                    "term": list(counts) + [None],  # None = marker row
                    "est": [v[0] for v in counts.values()] + [0],
                    "err": [v[1] for v in counts.values()] + [0],
                    "floor": [floor] * (len(counts) + 1),
                }
            )

    partials = toks.mapInPandas(
        sketch, "term string, est long, err long, floor long"
    )
    # Long-sum overflow audit: est/err/floor are token COUNTS, so every
    # sum below is bounded by the corpus's total token count <= total
    # corpus bytes (~2^47 at 100 TB) — far under 2^63, no guard needed.
    # See tests/test_long_sum_audit.py for the exactness pin past 2^53.
    total_floor = partials.filter(F.col("term").isNull()).agg(
        F.coalesce(F.sum("floor"), F.lit(0)).alias("total_floor")
    )
    merged = (
        partials.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(
            F.sum("est").alias("__e"),
            F.sum(F.col("est") - F.col("err")).alias("__lower"),
            F.sum("floor").alias("__tracked_floor"),
        )
        .crossJoin(F.broadcast(total_floor))
        .select(
            "term",
            (
                F.col("__e") + F.col("total_floor") - F.col("__tracked_floor")
            ).alias("est_count"),
            (
                F.col("__e")
                + F.col("total_floor")
                - F.col("__tracked_floor")
                - F.greatest(F.col("__lower"), F.lit(0))
            ).alias("err_bound"),
        )
    )
    w = Window.orderBy(F.desc("est_count"), F.asc("term"))
    return (
        merged.orderBy(F.desc("est_count"), F.asc("term"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def _cms_bucket(term: Column, d: Column, hex_digits: int) -> Column:
    """Engine-portable CMS bucket: the first ``hex_digits`` hex chars of
    md5(term|row) AS A STRING. Identical in any engine with md5 — the
    whole sketch (build AND probe) is therefore SQL-expressible, so CMS
    estimates hash-check exactly cross-engine despite being approximate
    with respect to the true counts."""
    return F.substring(
        F.md5(F.concat(term, F.lit("|"), d.cast("string"))), 1, hex_digits
    )


def cms_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Count-Min sketch over the token stream (Cormode & Muthukrishnan
    2005): ``depth`` hash rows × ``16^hex_digits`` buckets of exact
    bucket-counts. Returns (d, bucket, cnt).

    Scale shape (100 TB): the build is ONE groupBy over a key space
    bounded at depth × width — map-side partial aggregation collapses
    each partition to at most that many rows before the shuffle, so
    shuffle volume is independent of corpus size (the same property as
    the SpaceSaving merge, without per-partition eviction logic). The
    sketch table itself is broadcast-sized by construction.
    """
    toks = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
    )
    rows = toks.select(
        "term",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    return (
        rows.groupBy(
            "d", _cms_bucket(F.col("term"), F.col("d"), hex_digits).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: list[str],
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Point-query the sketch: est(term) = min over rows of the term's
    bucket count (0 if a bucket is empty). CMS guarantee: est >= true
    always; est <= true + eps*N with probability 1 - delta for
    width = e/eps, depth = ln(1/delta). The probe is |terms| x depth
    skinny rows against the broadcast-sized sketch."""
    spark = sketch.sparkSession
    probe = (
        spark.createDataFrame([(t,) for t in sorted(set(terms))], ["term"])
        .select(
            "term",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
        )
        .select(
            "term",
            "d",
            _cms_bucket(F.col("term"), F.col("d"), hex_digits).alias("bucket"),
        )
    )
    joined = probe.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )


#: Query parameters that carry no content identity (web-corpus dedup
#: convention: analytics/click trackers).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="


def _unreserved_chars() -> str:
    # RFC 3986 unreserved set in codepoint order: - . 0-9 A-Z _ a-z ~
    import string

    return "".join(
        sorted("-._~" + string.digits + string.ascii_letters, key=ord)
    )


#: Percent-escape forms of the RFC 3986 unreserved characters
#: (ALPHA / DIGIT / '-' / '.' / '_' / '~'): (escape, char) pairs in
#: codepoint order, upper-case hex form before lower-case. Decoding ONLY
#: these is semantics-preserving per RFC 3986 §2.3 (they never act as
#: delimiters); reserved escapes (%2F, %3F, ...) stay encoded. All three
#: implementations (this Spark expression, the DuckDB oracle via
#: pct_decode_unreserved_sql, and the pure-Python property reference)
#: apply them as sequential left-to-right replaces in THIS exact order —
#: a deterministic shared rule. On a pathological non-URL like '%4%41'
#: sequential replacement over-decodes ('%4'+'A' -> '%4A' -> 'J') where
#: a single-pass decoder would stop at '%4A'; for a dedup KEY that only
#: merges garbage inputs deterministically, and the property test pins
#: the chained semantics on exactly such inputs.
PCT_UNRESERVED_FORMS: list[tuple[str, str]] = [
    (form, ch)
    for ch in _unreserved_chars()
    for form in dict.fromkeys((f"%{ord(ch):02X}", f"%{ord(ch):02x}"))
]


def _pct_decode_unreserved(col: Column) -> Column:
    for form, ch in PCT_UNRESERVED_FORMS:
        col = F.replace(col, F.lit(form), F.lit(ch))
    return col


def pct_decode_unreserved_sql(expr: str) -> str:
    """The DuckDB/ANSI-SQL mirror of ``_pct_decode_unreserved``: the same
    replace chain in the same order, nested around ``expr`` — used by the
    dd13 oracle so both engines share one decode rule by construction."""
    for form, ch in PCT_UNRESERVED_FORMS:
        expr = f"replace({expr}, '{form}', '{ch}')"
    return expr


def canonicalize_url(col: Column | str) -> Column:
    """Canonical identity of a URL for web-corpus dedup (the RefinedWeb /
    CCNet-style URL-level dedup key): percent-escapes of UNRESERVED
    characters decoded (``%7E`` → ``~``, case-insensitive hex; reserved
    escapes kept), scheme dropped, host lowercased with ``www.``
    stripped, the scheme's OWN default port stripped (``:80`` only for
    http, ``:443`` only for https — ``http://x:443`` keeps its
    non-default port), path trailing-slash normalized ('' → '/'),
    fragment dropped, tracking query params
    (``utm_*``/``gclid``/``fbclid``/``ref``) removed and the surviving
    params SORTED so param order never splits an identity. The decode
    runs BEFORE param sorting: '%61=1' must sort as 'a=1', or the same
    decoded identity would split on its encoding.

    Remaining documented non-goals: punycode/IDN hosts are not unified
    with their unicode form, and reserved-character escapes (%2F in a
    path) are preserved as-is — both sides of each pair stay internally
    consistent, so dedup keys are stable, merely not unified across
    those rare variants.

    Built-in expressions only (regex + literal replaces + array HOFs —
    no UDF, stays in whole-stage codegen), and every rule is expressed
    identically in the DuckDB oracle (queries/llm.py dd13, which shares
    the decode chain via ``pct_decode_unreserved_sql``). Scale: pure
    per-row map, shuffle-free; the dedup that follows is an ordinary
    hash-groupBy on the canonical key.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(c), r"#.*$", "")  # fragment off first
    # Decode before any parsing/sorting: unreserved chars can never
    # introduce a delimiter, so parse structure is stable.
    u = _pct_decode_unreserved(u)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
