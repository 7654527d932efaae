"""K-step ordered funnel over an event stream.

Generalizes the ev5 query shape (queries/core.py) into a reusable
operator: step i counts users whose earliest qualifying step-i event is
at-or-after the time they reached step i-1 (the classic ordered funnel,
"view → click → purchase → …" for any step list).

Scale shape (100 TB): NO windows over the user key — each step is a
per-user min-aggregation (map-side partial, so a hot user collapses to
one row per mapper before the shuffle) chained through co-partitioned
equi-joins on user id, which AQE can skew-split. The skew probe measured
this family flat across 20%→60% hot-key shares (BENCH_NOTES.md "Round-6
skew probe"). The final step-count union is k one-row aggregates.

Reference has no funnel operator (SURVEY.md §2 "not present"); extension
for the events table, oracled as ev5b.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step funnel counts: (step_idx, step, users, conversion).

    ``conversion`` is users ÷ previous step's users (NULL for step 0) —
    integer-derived division, so cross-engine float equality is exact.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    dup = {s for s in steps if steps.count(s) > 1}
    if dup:
        raise ValueError(f"funnel: duplicate steps {sorted(dup)}")

    def step_events(s: str) -> DataFrame:
        return events.filter(F.col(type_col) == s).select(
            user_col, F.col(ts_col).alias("__t")
        )

    reached = (
        step_events(steps[0]).groupBy(user_col).agg(F.min("__t").alias("__reached"))
    )
    counts = [reached.agg(F.count(F.lit(1)).cast("bigint").alias("users"))]
    for s in steps[1:]:
        reached = (
            step_events(s)
            .join(reached, user_col)
            .filter(F.col("__t") >= F.col("__reached"))
            .groupBy(user_col)
            .agg(F.min("__t").alias("__reached"))
        )
        counts.append(reached.agg(F.count(F.lit(1)).cast("bigint").alias("users")))

    rows = counts[0].select(
        F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"), "users"
    )
    for i, c in enumerate(counts[1:], start=1):
        rows = rows.unionByName(
            c.select(
                F.lit(i).alias("step_idx"), F.lit(steps[i]).alias("step"), "users"
            )
        )
    w = Window.orderBy("step_idx")
    prev: Column = F.lag("users").over(w)
    # NULL (not NaN/error) when the previous step has no users — ANSI mode
    # raises DIVIDE_BY_ZERO even for doubles, and NULL is the defensible
    # answer for "conversion out of an empty cohort".
    return rows.withColumn(
        "conversion",
        F.when(prev > 0, F.col("users").cast("double") / prev.cast("double")),
    )
