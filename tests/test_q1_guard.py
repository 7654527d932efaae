"""q1's exact-cents long-sum guards (queries/core.py _guarded): the
count*max overflow proof AND the 2^45*100 floor-cast exactness proof
must pass silently in the normal domain and raise LOUDLY (never wrap,
never mis-round) on negative inputs, overflow risk, or magnitudes past
the provable-exactness bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.queries.core import _CENTS_EXACT_BOUND, _guarded

LONG_MAX = (1 << 63) - 1


def _frame(spark, n, mx, mn, mnraw=0.0):
    return spark.createDataFrame(
        [(float(123), n, mx, mn, float(mnraw))],
        "v: double, n: long, mx: long, mn: long, mnraw: double",
    )


def _sel(df):
    return df.select(
        _guarded(
            F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t",
            F.col("mnraw"),
        ).alias("g")
    )


def test_guard_passes_in_domain(spark):
    assert _sel(_frame(spark, 1000, 10**11, 0)).collect()[0]["g"] == 123.0


def test_guard_raises_on_negative_values(spark):
    with pytest.raises(Exception, match="negative scaled value"):
        _sel(_frame(spark, 10, 100, -1)).collect()


def test_guard_raises_on_overflow_risk(spark):
    # count * max crosses 2^63: the long sum MAY have wrapped — refuse.
    # mx stays inside the exactness bound so the overflow branch is the
    # one exercised.
    with pytest.raises(Exception, match="overflowed"):
        _sel(_frame(spark, 1 << 40, _CENTS_EXACT_BOUND, 0)).collect()


def test_guard_boundary_exact_long_max_passes(spark):
    # count*max == LONG_MAX exactly with mx inside the exactness bound:
    # both proofs still hold (<=)
    n = LONG_MAX // _CENTS_EXACT_BOUND
    assert n * _CENTS_EXACT_BOUND <= LONG_MAX
    assert _sel(_frame(spark, n, _CENTS_EXACT_BOUND, 0)).collect()[0][
        "g"
    ] == 123.0


def test_guard_raises_past_exactness_bound(spark):
    # one past 2^45*100: floor-cast cents recovery is no longer provably
    # exact — must raise even though the long sum itself cannot overflow
    with pytest.raises(Exception, match="provably exact"):
        _sel(_frame(spark, 1, _CENTS_EXACT_BOUND + 1, 0)).collect()


def test_guard_boundary_exactness_bound_passes(spark):
    assert _sel(_frame(spark, 1, _CENTS_EXACT_BOUND, 0)).collect()[0][
        "g"
    ] == 123.0


def test_guard_raises_on_raw_negative_that_truncates_to_zero_cents(spark):
    # an input in (-0.005, 0) scales to 0 cents (cast truncates toward
    # zero) and slips past the scaled min>=0 check; the raw-double min
    # proof must still catch it
    with pytest.raises(Exception, match="negative raw money value"):
        _sel(_frame(spark, 10, 100, 0, mnraw=-0.004)).collect()


def test_guard_optional_mnraw_omitted_keeps_legacy_behavior(spark):
    # callers without a raw-min column (none today, but the param is
    # optional) still get the scaled proofs
    df = _frame(spark, 1000, 10**11, 0)
    out = df.select(
        _guarded(F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t")
        .alias("g")
    )
    assert out.collect()[0]["g"] == 123.0
