"""Long-sum overflow audit (round 11, the guarded_cents_spend class):
every remaining F.sum over LongType token/gram counters is bounded by
TOTAL CORPUS BYTES (a token costs >= 1 byte), so at the 100 TB north
star the sums sit near 2^47 — orders of magnitude under 2^63 and no
count*max guard is needed. The audit notes live at each site
(operators/packing.py pack_stats, operators/sampling.py
sample_to_token_budget, operators/text.py top-k sketch merge / bigram
LM); this module makes the bound arithmetic executable and pins that
the LONG accumulation stays EXACT past double's 2^53 integer limit —
the reason these columns are long, not double."""

from __future__ import annotations

from pyspark.sql import functions as F

#: A single document's token count is bounded by its text size; JVM
#: strings / Arrow buffers cap a document around 2^31 bytes.
MAX_DOC_TOKENS = 1 << 33  # 2 bytes of slack over the 2^31 buffer cap

#: Corpus-wide token bound: 1 PB of text (10x the 100 TB north star),
#: 1 token per byte worst case.
MAX_CORPUS_TOKENS = 1 << 50

LONG_MAX = (1 << 63) - 1


def test_documented_bounds_leave_headroom():
    # The executable version of the site comments: even the 10x-scale
    # corpus bound leaves > 2^12 (4096x) headroom to the wrap point,
    # and a single pack (max_tokens cap or one oversize doc) is smaller
    # still. If either constant ever creeps toward LONG_MAX this fails
    # and the sites need the guarded_cents_spend treatment.
    assert MAX_CORPUS_TOKENS * 4096 <= LONG_MAX
    assert MAX_DOC_TOKENS < MAX_CORPUS_TOKENS


def test_pack_stats_long_sum_exact_past_double_precision(spark):
    from dbt_analytics_spark.operators.packing import pack_stats

    # Token counts summing to just past 2^53: a double accumulator
    # would round (2^53 + 1 is not representable); the long path must
    # be exact. Values are legal per the audit bound (each < 2^33).
    big = (1 << 33) - 1
    n = (1 << 53) // big + 2
    # Don't materialize n rows in the driver: synthesize distributedly.
    rows = spark.range(n).select(
        F.lit(7).alias("pack_id"),
        F.lit(big).cast("long").alias("n_tokens"),
    )
    got = pack_stats(rows, max_tokens=big).collect()[0]
    expect = n * big
    assert expect > (1 << 53)  # the regime double cannot hold
    assert got["pack_tokens"] == expect
    assert got["n_docs"] == n


def test_token_budget_cumsum_exact_past_double_precision(spark):
    # The distributed two-phase prefix sum (sampling.py) reduces to
    # SUM(long) over window partitions; pin the same exactness property
    # on its building block: a windowed long cumsum whose tail passes
    # 2^53 must hit the exact integer, bit-for-bit.
    from pyspark.sql import Window

    big = (1 << 33) - 1
    n = (1 << 53) // big + 2
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    tail = (
        spark.range(n)
        .select("id", F.lit(big).cast("long").alias("n_tok"))
        .withColumn("cum", F.sum("n_tok").over(w))
        .agg(F.max("cum").alias("last"))
        .collect()[0]["last"]
    )
    assert tail == n * big
