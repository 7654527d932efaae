"""K-step funnel operator: ordering semantics, dead steps, validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from dbt_analytics_spark.operators.funnel import funnel

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, event_type=t, ts=T0 + dt.timedelta(minutes=m))
            for u, t, m in rows
        ]
    )


def test_ordered_funnel_counts(spark):
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 5), (1, "buy", 9),
            (2, "view", 0), (2, "click", 3),
            (3, "click", 0), (3, "view", 5),      # click BEFORE view: no step-2
            (4, "buy", 0),                          # never viewed
            (5, "view", 0), (5, "click", 0),        # same-instant: inclusive
        ],
    )
    out = {r["step"]: r for r in funnel(ev, ["view", "click", "buy"]).collect()}
    assert out["view"]["users"] == 4       # users 1,2,3,5
    assert out["click"]["users"] == 3      # 1,2,5 (3's click precedes view)
    assert out["buy"]["users"] == 1        # only 1
    assert out["view"]["conversion"] is None
    assert out["click"]["conversion"] == 3 / 4
    assert out["buy"]["conversion"] == 1 / 3
    assert [r["step_idx"] for r in sorted(out.values(), key=lambda r: r["step_idx"])] == [0, 1, 2]


def test_dead_middle_step(spark):
    ev = _ev(spark, [(1, "view", 0), (1, "buy", 5)])
    out = {r["step"]: r["users"] for r in funnel(ev, ["view", "click", "buy"]).collect()}
    assert out == {"view": 1, "click": 0, "buy": 0}


def test_funnel_validation(spark):
    ev = _ev(spark, [(1, "view", 0)])
    with pytest.raises(ValueError, match="non-empty"):
        funnel(ev, [])
    with pytest.raises(ValueError, match="duplicate"):
        funnel(ev, ["view", "view"])
