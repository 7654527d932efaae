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


def test_token_budget_sample_bucket_invariance_and_edges(spark):
    """token_budget_sample (operators/sampling.py): the two-phase
    distributed prefix sum must be row-identical to the single-window
    formulation for ANY bucket count (buckets only slice the draw
    range), the budget-crossing document is excluded (hard cap), and a
    single document larger than the whole budget is excluded."""
    from dbt_analytics_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [
            (i, "g" + str(i % 2), " ".join(["w"] * (5 + i % 7)))
            for i in range(200)
        ]
        + [(999, "g_big", " ".join(["w"] * 500))],  # oversized single doc
        ["doc_id", "source", "text"],
    )
    runs = {
        n: sorted(
            map(
                tuple,
                token_budget_sample(
                    docs, ["source"], budget=300, n_buckets=n
                ).collect(),
            )
        )
        for n in (1, 4, 256)
    }
    assert runs[1] == runs[4] == runs[256]
    rows = runs[256]
    assert rows, "budget 300 must keep a nonempty prefix"
    # Hard cap: every kept cum_tok <= budget, and no group overshoots.
    assert all(r[3] <= 300 for r in rows)
    # The oversized doc's group keeps nothing.
    assert not [r for r in rows if r[0] == "g_big"]
