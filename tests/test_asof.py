"""asof_join edge semantics: boundary inclusivity, direction, how, and
row-consistency of carried columns."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dbt_analytics_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=_ts("2024-01-01 10:00:00")),
            Row(lid=2, k="a", ts=_ts("2024-01-01 12:00:00")),
            Row(lid=3, k="a", ts=_ts("2024-01-01 09:00:00")),  # before any right
            Row(lid=4, k="b", ts=_ts("2024-01-01 10:00:00")),  # key with no right
        ]
    )


def _right(spark):
    return spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), rv="r10", rx=10),
            Row(k="a", ts=_ts("2024-01-01 11:00:00"), rv=None, rx=11),
        ]
    )


def test_backward_inclusive_and_left_nulls(spark):
    out = {
        r["lid"]: r
        for r in asof_join(
            _left(spark), _right(spark), by=["k"], value_cols=["rv", "rx"]
        ).collect()
    }
    assert len(out) == 4
    # Equal timestamp matches (inclusive).
    assert out[1]["rv"] == "r10" and out[1]["rx"] == 10
    # Latest prior right row wins — and a NULL in that row's rv must NOT
    # fall back to an earlier row's value (struct propagation).
    assert out[2]["rv"] is None and out[2]["rx"] == 11
    # No prior right row / no right rows for the key -> nulls under how=left.
    assert out[3]["rx"] is None
    assert out[4]["rx"] is None


def test_forward_and_inner(spark):
    fwd = {
        r["lid"]: r
        for r in asof_join(
            _left(spark),
            _right(spark),
            by=["k"],
            value_cols=["rx"],
            direction="forward",
            how="inner",
        ).collect()
    }
    # lid=1 at 10:00 matches rx=10 (inclusive); lid=3 at 09:00 matches the
    # earliest following row (rx=10); lid=2 at 12:00 and key b have no
    # following right row -> dropped by how=inner.
    assert set(fwd) == {1, 3}
    assert fwd[1]["rx"] == 10 and fwd[3]["rx"] == 10


def test_bad_tolerance_string_raises_early(spark):
    import pytest

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 9, 1.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="bad tolerance"):
        asof_join(
            left, right, time_col="ts", by=["k"], value_cols=["v"],
            tolerance="2 hours; DROP TABLE x",
        )
    with pytest.raises(ValueError, match="bad tolerance"):
        asof_join(
            left, right, time_col="ts", by=["k"], value_cols=["v"],
            tolerance="soonish",
        )


def test_value_col_clash_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), _right(spark).withColumnRenamed("rx", "lid"),
                  by=["k"], value_cols=["lid"])


def test_asof_tolerance_bounds_the_match(spark):
    # pandas merge_asof(tolerance=...): a nearest row farther than the
    # bound is NO match. Numeric time axis for exactness.
    left = spark.createDataFrame(
        [(1, 100), (1, 205), (2, 100)], "k int, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b"), (2, 10, "c")], "k int, ts long, v string"
    )
    out = asof_join(
        left, right, time_col="ts", by=["k"], value_cols=["v"],
        direction="backward", tolerance=10,
    )
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    # (1,100): nearest prior is 90, gap 10 <= 10 -> match "a"
    # (1,205): nearest prior is 200, gap 5 -> "b"
    # (2,100): nearest prior is 10, gap 90 > 10 -> no match
    assert got == {(1, 100): "a", (1, 205): "b", (2, 100): None}

    inner = asof_join(
        left, right, time_col="ts", by=["k"], value_cols=["v"],
        direction="backward", tolerance=10, how="inner",
    )
    assert inner.count() == 2

    fwd = asof_join(
        left, right, time_col="ts", by=["k"], value_cols=["v"],
        direction="forward", tolerance=100,
    )
    got_f = {(r["k"], r["ts"]): r["v"] for r in fwd.collect()}
    # (1,100): next at 200, gap 100 <= 100 -> "b"; (1,205): none after;
    # (2,100): none after (right has only ts=10 for k=2).
    assert got_f == {(1, 100): "b", (1, 205): None, (2, 100): None}


def test_asof_tolerance_interval_on_timestamps(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, t(30)), (1, t(59))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(55), 20.0)], "k int, ts timestamp, v double"
    )
    out = asof_join(
        left, right, time_col="ts", by=["k"], value_cols=["v"],
        tolerance="15 minutes",
    )
    got = {r["ts"].minute: r["v"] for r in out.collect()}
    # 00:30's nearest prior is 00:00 (gap 30m > 15m) -> null;
    # 00:59's nearest prior is 00:55 (gap 4m) -> 20.0
    assert got == {30: None, 59: 20.0}
