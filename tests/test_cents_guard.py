"""guarded_cents_spend (plans/star_layout.py): the layout path sums
o_cents as LONG for speed; the count*max guard must (a) be invisible at
legitimate magnitudes — exact to the decimal reference even when the sum
is within 2x of 2^63 — and (b) fail LOUDLY, not wrap silently, when a
group's count*max bound can no longer prove safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.plans.star_layout import (
    LONG_MAX,
    guarded_cents_spend,
)


def _agg(spark, rows):
    df = spark.createDataFrame(rows, "g string, cents long")
    return df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents"),
        F.max("cents").alias("mx"),
    )


def test_guard_exact_at_adversarial_magnitudes(spark):
    # Sum sits at ~0.75 * 2^63 — far past double's 53-bit integer
    # exactness and within 2x of the wrap point — and must come out
    # exact (decimal division, not float), while count*max stays
    # provably under 2^63.
    big = LONG_MAX // 4 * 3  # 3 * 2^61ish, fits a long
    half = big // 2
    rows = [("hot", half), ("hot", big - half), ("cold", 123456789)]
    out = {
        r["g"]: r["spend"]
        for r in _agg(spark, rows)
        .select(
            "g",
            guarded_cents_spend(
                F.col("n"), F.col("cents"), F.col("mx")
            ).alias("spend"),
        )
        .collect()
    }
    import decimal

    assert out["hot"] == float(decimal.Decimal(big) / 100)
    assert out["cold"] == 1234567.89


def test_guard_raises_past_provable_bound(spark):
    # 3 rows of ~2^62: the true sum exceeds 2^63 (a long sum WRAPS to a
    # wrong-but-plausible number); count*max detects it and raises.
    v = LONG_MAX // 2  # ~2^62
    rows = [("hot", v), ("hot", v), ("hot", v)]
    agg = _agg(spark, rows).select(
        guarded_cents_spend(F.col("n"), F.col("cents"), F.col("mx")).alias(
            "spend"
        )
    )
    with pytest.raises(Exception, match="overflow"):
        agg.collect()
