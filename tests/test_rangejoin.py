"""interval_join semantics: containment bounds, multi-match, left nulls,
and the open-ended-interval guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dbt_analytics_spark.operators.rangejoin import interval_join


def _points(spark):
    return spark.createDataFrame(
        [Row(pid=1, v=5.0), Row(pid=2, v=10.0), Row(pid=3, v=99.0), Row(pid=4, v=-3.0)]
    )


def _ivals(spark):
    return spark.createDataFrame(
        [Row(name="a", lo=0.0, hi=10.0), Row(name="b", lo=5.0, hi=50.0)]
    )


def test_containment_and_multimatch(spark):
    got = {
        (r["pid"], r["name"])
        for r in interval_join(
            _points(spark), _ivals(spark), "v", "lo", "hi", bin_width=10.0
        ).collect()
    }
    # v=5 is in both [0,10) and [5,50); v=10 only in [5,50) (hi exclusive);
    # v=99 and v=-3 match nothing.
    assert got == {(1, "a"), (1, "b"), (2, "b")}


def test_left_keeps_unmatched(spark):
    rows = {
        r["pid"]: r["name"]
        for r in interval_join(
            _points(spark), _ivals(spark), "v", "lo", "hi", bin_width=10.0, how="left"
        ).collect()
        if r["name"] is None
    }
    assert set(rows) == {3, 4}


def test_open_interval_guard(spark):
    wide = spark.createDataFrame([Row(name="inf", lo=0.0, hi=1e12)])
    with pytest.raises(Exception, match="max_bins_per_interval"):
        interval_join(
            _points(spark), wide, "v", "lo", "hi", bin_width=1.0
        ).collect()
