"""Two-phase (time-bucketed) sessionize and as-of join: row-identical to
the single-window plans on random and adversarial data, for any bucket
width — the skew mitigations measured in skew_probe.py / BENCH_NOTES.md
"Round-6 skew probe"."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_analytics_spark.operators.asof import asof_join
from dbt_analytics_spark.operators.sessionize import session_stats, sessionize

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _random_events(seed: int, n_users: int = 12, n_events: int = 1500, skew_user: int | None = None):
    """Deterministic random event stream; optional hot user takes ~25% of
    rows. Gaps cluster around the 30-minute session threshold and include
    exact ties and multi-hour dead zones (sessions spanning empty buckets)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        if skew_user is not None and rng.random() < 0.25:
            u = skew_user
        else:
            u = rng.randrange(n_users)
        ts = T0 + dt.timedelta(
            seconds=rng.choice(
                [rng.randrange(0, 3600 * 72), rng.randrange(0, 3600) * 60]
            )
        )
        rows.append(Row(user_id=u, event_id=i, ts=ts))
    # Exact-duplicate timestamps per user (order_cols tie-break coverage).
    for j in range(40):
        rows.append(Row(user_id=j % n_users, event_id=n_events + j, ts=rows[j]["ts"]))
    return rows


def _py_sessionize(rows, gap_sec: float = 1800.0):
    """Reference: per-user sort by (ts, event_id), new session iff gap > G."""
    out = {}
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        sid = 0
        prev = None
        for r in evs:
            if prev is None or (r["ts"] - prev).total_seconds() > gap_sec:
                sid += 1
            out[r["event_id"]] = sid
            prev = r["ts"]
    return out


def _collect_sessions(df):
    return {r["event_id"]: r["session_id"] for r in df.collect()}


def test_single_window_matches_python_reference(spark):
    rows = _random_events(seed=7)
    df = spark.createDataFrame(rows)
    got = _collect_sessions(
        sessionize(df, gap="30 minutes", order_cols=["event_id"])
    )
    assert got == _py_sessionize(rows)


def test_bucketed_matches_single_window_any_width(spark):
    rows = _random_events(seed=11)
    df = spark.createDataFrame(rows)
    want = _py_sessionize(rows)
    # Wide, narrow (< gap: forces in-session boundary merges), and tiny
    # (sessions span many buckets, incl. empty ones) widths all agree.
    for bucket in ["6 hours", "10 minutes", "90 seconds"]:
        got = _collect_sessions(
            sessionize(
                df, gap="30 minutes", order_cols=["event_id"], bucket=bucket
            )
        )
        assert got == want, f"bucket={bucket}"


def test_bucketed_under_hot_key(spark):
    rows = _random_events(seed=13, skew_user=3)
    df = spark.createDataFrame(rows).repartition(8)
    want = _py_sessionize(rows)
    got = _collect_sessions(
        sessionize(df, gap="30 minutes", order_cols=["event_id"], bucket="3 hours")
    )
    assert got == want
    # session_stats grain: one row per (user, session), counts add up.
    stats = session_stats(
        sessionize(df, gap="30 minutes", order_cols=["event_id"], bucket="3 hours")
    )
    agg = stats.agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("s")
    ).collect()[0]
    assert agg["n"] == len(rows)
    assert agg["s"] == len({(r["user_id"], want[r["event_id"]]) for r in rows})


def _random_asof_sides(seed: int, n_keys: int = 8, nl: int = 400, nr: int = 300):
    rng = random.Random(seed)
    left = [
        Row(
            lid=i,
            k=rng.randrange(n_keys),
            ts=T0 + dt.timedelta(seconds=rng.randrange(0, 3600 * 48)),
        )
        for i in range(nl)
    ]
    right = [
        Row(
            k=rng.randrange(n_keys),
            ts=T0 + dt.timedelta(seconds=rng.randrange(0, 3600 * 48)),
            v=float(i),
        )
        for i in range(nr)
    ]
    # Boundary coverage: right rows exactly at some left timestamps.
    for j in range(30):
        right.append(Row(k=left[j]["k"], ts=left[j]["ts"], v=1000.0 + j))
    return left, right


def _dedupe_right(spark, right):
    # asof contract: unique (k, ts) on the right for a deterministic winner.
    return (
        spark.createDataFrame(right)
        .groupBy("k", "ts")
        .agg(F.max("v").alias("v"))
    )


def test_bucketed_asof_matches_single_phase(spark):
    left_rows, right_rows = _random_asof_sides(seed=3)
    left = spark.createDataFrame(left_rows)
    right = _dedupe_right(spark, right_rows)
    for direction in ["backward", "forward"]:
        for how in ["left", "inner"]:
            for tol in [None, "45 minutes"]:
                base = asof_join(
                    left, right, by=["k"], value_cols=["v"],
                    direction=direction, how=how, tolerance=tol,
                )
                bucketed = asof_join(
                    left, right, by=["k"], value_cols=["v"],
                    direction=direction, how=how, tolerance=tol,
                    time_bucket="2 hours",
                )
                a = {(r["lid"]): (r["v"]) for r in base.collect()}
                b = {(r["lid"]): (r["v"]) for r in bucketed.collect()}
                assert a == b, f"{direction}/{how}/tol={tol}"


def test_bucketed_asof_narrow_buckets_and_empty_gaps(spark):
    # Bucket width far below typical gaps: matches must carry across many
    # consecutive empty buckets via the seed pass.
    left_rows, right_rows = _random_asof_sides(seed=9, n_keys=4, nl=120, nr=25)
    left = spark.createDataFrame(left_rows)
    right = _dedupe_right(spark, right_rows)
    for direction in ["backward", "forward"]:
        base = asof_join(
            left, right, by=["k"], value_cols=["v"], direction=direction
        )
        bucketed = asof_join(
            left, right, by=["k"], value_cols=["v"], direction=direction,
            time_bucket="5 minutes",
        )
        a = {r["lid"]: r["v"] for r in base.collect()}
        b = {r["lid"]: r["v"] for r in bucketed.collect()}
        assert a == b, direction


# --- hypothesis property: two-phase == single-window for ANY stream ------
from hypothesis import given, settings
from hypothesis import strategies as st

_streams = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # user
        st.integers(min_value=0, max_value=3 * 86_400),   # offset seconds
    ),
    min_size=1,
    max_size=60,
)
_buckets = st.sampled_from(["7 minutes", "1 hour", "1 day"])


@settings(max_examples=8, deadline=None)
@given(stream=_streams, bucket=_buckets)
def test_property_two_phase_sessionize_identical(spark, stream, bucket):
    rows = [
        Row(user_id=u, event_id=i, ts=T0 + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(stream)
    ]
    df = spark.createDataFrame(rows)
    got = _collect_sessions(
        sessionize(df, gap="30 minutes", order_cols=["event_id"], bucket=bucket)
    )
    assert got == _py_sessionize(rows)


@settings(max_examples=6, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 86_400)),
        min_size=1, max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 86_400)),
        min_size=0, max_size=30,
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_property_bucketed_asof_identical(spark, left, right, direction):
    ldf = spark.createDataFrame(
        [Row(lid=i, k=k, ts=T0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)]
    )
    rrows = [Row(k=k, ts=T0 + dt.timedelta(seconds=s), v=float(i)) for i, (k, s) in enumerate(right)]
    rdf = (
        _dedupe_right(spark, rrows)
        if rrows
        else spark.createDataFrame([], "k bigint, ts timestamp, v double")
    )
    base = asof_join(ldf, rdf, by=["k"], value_cols=["v"], direction=direction)
    bucketed = asof_join(
        ldf, rdf, by=["k"], value_cols=["v"], direction=direction,
        time_bucket="33 minutes",
    )
    a = {r["lid"]: r["v"] for r in base.collect()}
    b = {r["lid"]: r["v"] for r in bucketed.collect()}
    assert a == b


def test_bucketed_asof_numeric_time_axis(spark):
    left = spark.createDataFrame(
        [(i, i % 3, 100 * i + 7) for i in range(60)], "lid int, k int, ts long"
    )
    right = spark.createDataFrame(
        [(i % 3, 250 * i, float(i)) for i in range(20)], "k int, ts long, v double"
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    for direction in ["backward", "forward"]:
        base = asof_join(
            left, right, time_col="ts", by=["k"], value_cols=["v"],
            direction=direction,
        )
        bucketed = asof_join(
            left, right, time_col="ts", by=["k"], value_cols=["v"],
            direction=direction, time_bucket=700,
        )
        a = {r["lid"]: r["v"] for r in base.collect()}
        b = {r["lid"]: r["v"] for r in bucketed.collect()}
        assert a == b, direction

    import pytest

    with pytest.raises(ValueError, match="temporal time_col"):
        asof_join(left, right, time_col="ts", by=["k"], value_cols=["v"],
                  time_bucket="1 day")
    tleft = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], "lid int, k int, ts timestamp"
    )
    tright = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "k int, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="numeric time_col"):
        asof_join(tleft, tright, time_col="ts", by=["k"], value_cols=["v"],
                  time_bucket=3600)
    with pytest.raises(ValueError, match="positive"):
        asof_join(left, right, time_col="ts", by=["k"], value_cols=["v"],
                  time_bucket=0)
