"""profile_table: shape, null/distinct accounting, approx mode."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dbt_analytics_spark.plans.profiling import profile_table


def test_exact_profile_counts(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=2, b=None),
            Row(a=2, b="yy"),
            Row(a=None, b="x"),
        ]
    )
    rows = {r["column"]: r for r in profile_table(df, approx=False).collect()}
    assert set(rows) == {"a", "b"}
    a, b = rows["a"], rows["b"]
    assert a["n_rows"] == 4 and a["n_null"] == 1 and a["n_distinct"] == 2
    assert (a["min_v"], a["max_v"]) == ("1", "2")
    assert a["sum_len"] == 3  # "1" + "2" + "2"
    assert b["n_null"] == 1 and b["n_distinct"] == 2
    assert (b["min_v"], b["max_v"]) == ("x", "yy")
    assert b["sum_len"] == 4  # "x" + "yy" + "x"


def test_approx_profile_single_pass(spark):
    df = spark.range(5000).selectExpr("id", "id % 37 AS k")
    out = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    # HLL++ default rsd is 5%; allow ~2.5 sigma.
    assert abs(out["id"]["n_distinct"] - 5000) <= 650
    assert abs(out["k"]["n_distinct"] - 37) <= 2
    assert out["id"]["n_null"] == 0
    # Exactly ONE aggregate job shape: no per-column scans in the plan.
    plan = profile_table(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1


def test_unknown_column_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, columns=["nope"])
