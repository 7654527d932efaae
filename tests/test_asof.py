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


def test_value_col_clash_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), _right(spark).withColumnRenamed("rx", "lid"),
                  by=["k"], value_cols=["lid"])
