"""q1's exact-cents long-sum overflow guard (queries/core.py _guarded):
the count*max proof must pass silently in the normal domain and raise
LOUDLY (never wrap) on negative inputs or overflow risk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.queries.core import _guarded

LONG_MAX = (1 << 63) - 1


def _frame(spark, n, mx, mn):
    return spark.createDataFrame(
        [(float(123), n, mx, mn)], "v: double, n: long, mx: long, mn: long"
    )


def test_guard_passes_in_domain(spark):
    df = _frame(spark, 1000, 10**11, 0)
    out = df.select(
        _guarded(F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t")
        .alias("g")
    )
    assert out.collect()[0]["g"] == 123.0


def test_guard_raises_on_negative_values(spark):
    df = _frame(spark, 10, 100, -1)
    with pytest.raises(Exception, match="negative scaled value"):
        df.select(
            _guarded(F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t")
        ).collect()


def test_guard_raises_on_overflow_risk(spark):
    # count * max crosses 2^63: the long sum MAY have wrapped — refuse
    df = _frame(spark, 1 << 40, 1 << 40, 0)
    with pytest.raises(Exception, match="overflowed"):
        df.select(
            _guarded(F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t")
        ).collect()


def test_guard_boundary_exact_long_max_passes(spark):
    # count*max == LONG_MAX exactly: the proof still holds (<=)
    df = _frame(spark, 1, LONG_MAX, 0)
    out = df.select(
        _guarded(F.col("v"), F.col("n"), F.col("mx"), F.col("mn"), "t")
        .alias("g")
    )
    assert out.collect()[0]["g"] == 123.0
