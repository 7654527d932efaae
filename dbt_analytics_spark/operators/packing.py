"""Sequence packing: assign documents to fixed-token-budget training packs.

The pre-training data step after cleaning/dedup: concatenate documents
into max_tokens-sized sequences with minimal padding waste. Optimal bin
packing is NP-hard and inherently sequential; the scalable compromise is
hash-grouped greedy first-fit-decreasing:

  group_id = xxhash64(doc id) % n_groups       (deterministic, no RNG)
  within each group: sort by (token_count desc, doc id), first-fit into
  packs of capacity max_tokens (docs longer than the budget get a
  singleton pack, flagged oversize)

Groups are independent parallel units — ``applyInPandas`` over the group
key, Arrow-batched, the ONLY shuffle is the group-by. Waste stays low
because each group sees a large sample of the length distribution (FFD
is a 11/9·OPT + 6/9 approximation within a group). Output is
partitioning-independent and reproducible: group membership depends only
on ids, the in-group order is total, and pack ids are
``group_id * 2^32 + local_idx``.

Not SQL-expressible (procedural greedy loop) → rows-only in the oracle
gate; invariants are pinned by tests/test_packing.py: every doc exactly
once, no pack over budget (except flagged oversize singletons),
utilization floor on realistic length mixes, byte-identical output
across repartitionings, and equality with a pure-Python reference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count


def _pack_group(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    """Greedy first-fit-decreasing within one hash group (driver-free).

    Round 17 (guide §4.2 — hand the batch to vectorized native code):
    first-fit's inner scan ("first open pack with capacity >= n") was a
    pure-Python loop over open packs; FFD tends to keep early packs
    full, so most docs scanned deep into the list — O(docs x packs)
    interpreted iterations dominated the pipeline's pack stage (stage
    attribution: 8.9 s of a 48.6 s wall at 697k chunks). The scan is
    now one numpy comparison + argmax over the open-capacity array —
    same asymptotics, C speed. Semantics are bit-identical: argmax over
    the boolean mask returns the FIRST fitting index, exactly the loop's
    break; assignment order, pack ids and oversize flags are unchanged
    (pinned by tests/test_packing.py's pure-Python reference equality).
    """
    import numpy as np

    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    group_id = int(pdf["group_id"].iloc[0])
    sizes = pdf["n_tokens"].to_numpy()
    caps = np.empty(len(sizes), dtype=np.int64)  # remaining cap per pack
    n_packs = 0
    assign = np.empty(len(sizes), dtype=np.int64)
    oversize = np.zeros(len(sizes), dtype=bool)
    for j in range(len(sizes)):
        n = int(sizes[j])
        if n > max_tokens:
            caps[n_packs] = 0  # oversize singleton: full, nothing joins it
            assign[j] = n_packs
            oversize[j] = True
            n_packs += 1
            continue
        if n_packs:
            fits = caps[:n_packs] >= n
            i = int(np.argmax(fits))  # first True, or 0 when none fit
            if fits[i]:
                caps[i] -= n
                assign[j] = i
                continue
        caps[n_packs] = max_tokens - n
        assign[j] = n_packs
        n_packs += 1
    out = pdf.copy()
    out["pack_id"] = (group_id << 32) + assign
    out["oversize"] = oversize
    return out[["doc_id", "n_tokens", "pack_id", "oversize"]]


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_groups: int = 64,
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, oversize) — every input doc assigned to
    exactly one pack of ≤ ``max_tokens`` whitespace tokens (oversize docs
    become flagged singleton packs). ``n_groups`` bounds parallelism and
    per-task memory (~|docs| / n_groups rows per group); larger groups
    pack tighter."""
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text counts as 0 tokens (the doc still packs exactly once) —
        # a NULL would reach the pandas group as NaN and crash int().
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
        .cast("long")
        .alias("group_id"),
    )
    schema = "doc_id long, n_tokens long, pack_id long, oversize boolean"
    if dict(docs.dtypes).get(id_col) == "string":
        schema = "doc_id string, n_tokens long, pack_id long, oversize boolean"
    return sized.groupBy("group_id").applyInPandas(
        lambda pdf: _pack_group(pdf, max_tokens), schema
    )


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Pack-level rollup: (pack_id, n_docs, pack_tokens, fill_ratio).

    Long-sum overflow audit (the guarded_cents_spend question, answered
    by bound here): pack_tokens sums within ONE pack, which the packer
    caps at max_tokens — except oversize singleton packs, where the sum
    is one doc's token count, itself < 2^33 (a token needs >= 1 byte; a
    single document's text is bounded by the JVM string/Arrow buffer
    limits, ~2^31 bytes). Either way pack_tokens < max(max_tokens, 2^33)
    << 2^63 — no guard needed. Exactness at these magnitudes is pinned
    by tests/test_long_sum_audit.py."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        (F.sum("n_tokens") / F.lit(float(max_tokens))).alias("fill_ratio"),
    )
