"""Seeded randomized cross-checks: the composed asof_join / interval_join
operators must agree with brute-force O(n·m) references on irregular data
(duplicate timestamps, empty keys, boundary hits)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dbt_analytics_spark.operators.asof import asof_join
from dbt_analytics_spark.operators.rangejoin import interval_join

RNG = np.random.default_rng(42)


def test_asof_join_matches_bruteforce(spark):
    n_l, n_r = 300, 120
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": RNG.integers(0, 8, n_l),
            "t": RNG.integers(0, 500, n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": RNG.integers(0, 10, n_r),  # keys 8-9 never match
            "t": RNG.integers(0, 500, n_r),
            "rv": np.round(RNG.random(n_r), 6),
        }
    )
    # Deterministic winner per (k, t): keep max rv (pre-aggregate dupes).
    right = right.groupby(["k", "t"], as_index=False)["rv"].max()

    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right).withColumnRenamed("t", "t"),
            time_col="t",
            by=["k"],
            value_cols=["rv"],
        ).collect()
    }

    assert len(got) == n_l
    for _, lrow in left.iterrows():
        cand = right[(right["k"] == lrow["k"]) & (right["t"] <= lrow["t"])]
        expect = None
        if len(cand):
            expect = cand.sort_values("t").iloc[-1]["rv"]
        actual = got[lrow["lid"]]
        assert (actual is None and expect is None) or actual == expect, lrow["lid"]


def test_interval_join_matches_bruteforce(spark):
    n_p, n_i = 400, 60
    points = pd.DataFrame(
        {"pid": np.arange(n_p), "v": np.round(RNG.random(n_p) * 100, 3)}
    )
    lo = np.round(RNG.random(n_i) * 90, 3)
    ivals = pd.DataFrame(
        {
            "iid": np.arange(n_i),
            "lo": lo,
            "hi": np.round(lo + RNG.random(n_i) * 30, 3),
        }
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            spark.createDataFrame(points),
            spark.createDataFrame(ivals),
            "v",
            "lo",
            "hi",
            bin_width=7.0,
        ).collect()
    }
    expect = {
        (int(p.pid), int(i.iid))
        for _, p in points.iterrows()
        for _, i in ivals.iterrows()
        if i.lo <= p.v < i.hi
    }
    assert got == expect
