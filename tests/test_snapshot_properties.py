"""Property-based SCD-2 invariants: for ANY sequence of snapshot passes,
the history table must keep its structural guarantees (hypothesis drives
random key/value update sequences through the check strategy).

Invariants (dbt snapshot contract, SP/.../snapshots/snapshot.sql):
1. exactly one CURRENT row (dbt_valid_to IS NULL) per key ever seen
   (hard_deletes='ignore' keeps vanished keys' current rows);
2. per key, validity intervals chain contiguously — each closed row's
   valid_to equals the next row's valid_from, no overlaps and no gaps;
3. the current row carries the key's latest observed value;
4. re-snapshotting an identical source is a no-op (no new versions).
"""

from __future__ import annotations

import datetime as dt
import uuid
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_analytics_spark.plans import Project
from dbt_analytics_spark.plans.snapshot import snapshot

_passes = st.lists(
    st.dictionaries(
        keys=st.integers(min_value=1, max_value=4),
        values=st.sampled_from(["a", "b", "c", None]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(passes=_passes)
def test_scd2_invariants_hold_for_any_update_sequence(spark, passes):
    name = f"prop_snap_{uuid.uuid4().hex[:8]}"
    p = Project(spark, name="props")
    try:
        for i, src in enumerate(passes):
            df = spark.createDataFrame(
                sorted(src.items()), "id int, val string"
            )
            snapshot(
                p, name, df, unique_key="id", strategy="check",
                at=dt.datetime(2024, 1, 1 + i),
            )

        rows = spark.table(name).collect()
        per_key: dict[int, list] = defaultdict(list)
        for r in rows:
            per_key[r["id"]].append(r)

        ever_seen = set().union(*[set(s) for s in passes])
        assert set(per_key) == ever_seen

        for k in ever_seen:
            current = [r for r in per_key[k] if r["dbt_valid_to"] is None]
            assert len(current) == 1, (k, per_key[k])  # invariant 1

            closed = sorted(
                (r for r in per_key[k] if r["dbt_valid_to"] is not None),
                key=lambda r: r["dbt_valid_from"],
            )
            chain = closed + current
            for a, b in zip(chain, chain[1:]):  # invariant 2
                assert a["dbt_valid_to"] == b["dbt_valid_from"], (k, chain)

        latest: dict[int, str | None] = {}
        for src in passes:
            latest.update(src)
        for k, v in latest.items():  # invariant 3
            cur = next(r for r in per_key[k] if r["dbt_valid_to"] is None)
            assert cur["val"] == v, (k, cur["val"], v)

        n_before = spark.table(name).count()  # invariant 4
        snapshot(
            p,
            name,
            spark.createDataFrame(sorted(passes[-1].items()), "id int, val string"),
            unique_key="id",
            strategy="check",
            at=dt.datetime(2024, 2, 1),
        )
        assert spark.table(name).count() == n_before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
