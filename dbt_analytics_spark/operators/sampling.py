"""Budget-constrained corpus sampling: distributed prefix sums.

A pretraining data mix is usually specified as TOKEN budgets per domain
("20M tokens of code, 5M of forums, ..."), not keep-rates: fill each
group's budget by walking its documents in a deterministic pseudo-random
order and stopping when the running token total exceeds the budget. The
rate-based samplers (smp1/2/4 in queries/llm.py) cannot express this —
they bound expected counts, not realized token totals.

The running total is a per-group PREFIX SUM, and the naive formulation
(one window per group ordered by the draw) serializes each group into a
single partition — the hottest domain becomes one task at 100 TB. This
module computes the prefix sum with the classic two-phase distributed
decomposition instead (the same trick sessionize.py uses for skewed
windows):

1. slice each group into ``n_buckets`` ORDERED ranges of the draw key
   (the bucket id is the draw's high bits, so bucket order == draw
   order);
2. one tiny aggregate computes per-(group, bucket) token sums — a
   groups×buckets frame — and a window over THAT frame (ordered by
   bucket) yields each bucket's starting offset;
3. a window partitioned by (group, bucket) — parallelism × n_buckets —
   computes the local prefix within each slice; local prefix + bucket
   offset is the exact global prefix.

Results are bit-identical to the single-window formulation (the DuckDB
oracle runs exactly that), while the widest window any task sees is one
bucket of one group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

#: Deterministic 32-bit draw from a document id (the engine-wide sampler
#: convention — see queries/llm.py smp1/smp2/smp4: md5 of the id's
#: string form, first 8 hex digits).
def _draw(id_col: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def token_budget_sample(
    docs: DataFrame,
    group_cols: Sequence[str],
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Keep, per group, the deterministic-draw-ordered prefix of documents
    whose running whitespace-token total stays ≤ ``budget`` (the document
    that crosses the budget is excluded; a single document larger than
    the whole budget is excluded too — budgets are hard caps).

    Returns ``group_cols + (id_col, n_tok, cum_tok)`` where ``cum_tok``
    is the inclusive running total in draw order.
    """
    groups = list(group_cols)
    shift = 32 - max(1, n_buckets).bit_length() + 1
    base = docs.select(
        *groups,
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tok"),
        _draw(id_col).alias("__draw"),
    ).withColumn("__bucket", F.shiftrightunsigned("__draw", shift))
    # Both phases consume this projection (the offsets aggregate AND the
    # final join); without a checkpoint Catalyst recomputes the lineage —
    # i.e. re-scans and RE-TOKENIZES the corpus text — once per branch
    # (measured 2x at 500k docs). The checkpointed frame is the SKINNY
    # one (group keys + three ints per doc, no text), so materializing it
    # costs a tiny fraction of the tokenize pass it deduplicates.
    base = base.localCheckpoint(eager=False)

    # Long-sum overflow audit: every token-count sum below (per-bucket
    # __bsum, the __offset prefix, the global cum_tok) is bounded by the
    # CORPUS'S TOTAL TOKEN COUNT, and a token costs >= 1 byte of input,
    # so the sums are <= total corpus bytes — 100 TB ~= 2^47, a 1 PB
    # corpus ~= 2^50, both orders of magnitude under 2^63. No count*max
    # guard needed (contrast star_layout.guarded_cents_spend, where
    # per-row values reach 10^7 cents and hot groups concentrate).
    # Exactness past double's 2^53 integer limit is pinned by
    # tests/test_long_sum_audit.py.
    # Phase 1: per-(group, bucket) token sums — a groups×buckets frame —
    # then each bucket's starting offset from a window over that tiny
    # frame. exclusive offset = cumulative sum minus the bucket's own.
    per_bucket = base.groupBy(*groups, "__bucket").agg(
        F.sum("n_tok").alias("__bsum")
    )
    wb = (
        Window.partitionBy(*groups)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        *groups,
        "__bucket",
        F.coalesce(F.sum("__bsum").over(wb), F.lit(0)).alias("__offset"),
    )

    # Phase 2: local prefix within each (group, bucket) slice; global
    # prefix = local + bucket offset. Ties on the draw break by id, so
    # the total order matches the oracle's single window exactly.
    wl = (
        Window.partitionBy(*groups, "__bucket")
        .orderBy("__draw", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), groups + ["__bucket"])
        .withColumn(
            "cum_tok", F.sum("n_tok").over(wl) + F.col("__offset")
        )
        .filter(F.col("cum_tok") <= F.lit(int(budget)))
        .select(*groups, id_col, "n_tok", "cum_tok")
    )
