"""guarded_cents_spend (plans/star_layout.py): the layout path sums
o_cents as LONG for speed; the count*max guard must (a) be invisible at
legitimate magnitudes — exact to the decimal reference even when the sum
is within 2x of 2^63 — and (b) fail LOUDLY, not wrap silently, when a
group's count*max bound can no longer prove safety, and (c) fail LOUDLY
when the proof's non-negativity precondition is violated (negative cents
can wrap the sum negatively while count*max stays under the bound)."""

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
        F.min("cents").alias("mn"),
    )


def _spend(agg):
    return agg.select(
        "g",
        guarded_cents_spend(
            F.col("n"), F.col("cents"), F.col("mx"), F.col("mn")
        ).alias("spend"),
    )


def test_guard_exact_at_adversarial_magnitudes(spark):
    # Sum sits at ~0.75 * 2^63 — far past double's 53-bit integer
    # exactness and within 2x of the wrap point — and must come out
    # exact (decimal division, not float), while count*max stays
    # provably under 2^63.
    big = LONG_MAX // 4 * 3  # 3 * 2^61ish, fits a long
    half = big // 2
    rows = [("hot", half), ("hot", big - half), ("cold", 123456789)]
    out = {r["g"]: r["spend"] for r in _spend(_agg(spark, rows)).collect()}
    import decimal

    assert out["hot"] == float(decimal.Decimal(big) / 100)
    assert out["cold"] == 1234567.89


def test_guard_raises_past_provable_bound(spark):
    # 3 rows of ~2^62: the true sum exceeds 2^63 (a long sum WRAPS to a
    # wrong-but-plausible number); count*max detects it and raises.
    v = LONG_MAX // 2  # ~2^62
    rows = [("hot", v), ("hot", v), ("hot", v)]
    with pytest.raises(Exception, match="overflow"):
        _spend(_agg(spark, rows)).collect()


def test_guard_raises_on_negative_cents(spark):
    # The count*max proof is unsound for signed values: three huge
    # negatives push the long sum past -2^63 while count*max (count * a
    # small positive max) passes. Under ANSI (this session's default)
    # the SUM itself raises ARITHMETIC_OVERFLOW before the guard runs;
    # under non-ANSI the wrap is silent and the min >= 0 check is the
    # only line of defense. Either way the contract is LOUD, not a
    # wrapped number.
    v = -(LONG_MAX // 2) - 2  # ~ -2^62
    rows = [("hot", v), ("hot", v), ("hot", v), ("hot", 100)]
    with pytest.raises(Exception, match="non-negative|ARITHMETIC_OVERFLOW"):
        _spend(_agg(spark, rows)).collect()


def test_guard_raises_on_any_refund_row(spark):
    # Even a harmless-looking single refund must raise: the guard's
    # contract is that the precondition is machine-checked, not that it
    # guesses when negatives are 'safe enough'.
    rows = [("hot", 500), ("hot", -1)]
    with pytest.raises(Exception, match="non-negative"):
        _spend(_agg(spark, rows)).collect()
