"""Gap-based sessionization with a skew-proof two-phase variant.

The classic Spark idiom — ``lag`` + running flag-sum over a window
partitioned by the session key — is one shuffle and optimal when keys are
balanced (EV1, ``queries/core.py``). Its failure mode at 100 TB is key
skew: a window partition is NEVER split, so one bot/whale user holding 20%
of events serializes 20% of the data through a single task (AQE splits
skewed *joins*, not windows — measured in ``skew_probe.py`` and
BENCH_NOTES.md "Round-6 skew probe").

``sessionize(..., bucket=...)`` is the mitigation: a composite-key
two-phase plan whose per-event windows key on ``(user, time_bucket)`` —
bounded by bucket width, immune to per-user volume — with a per-BUCKET
(not per-event) reconciliation pass to stitch sessions that span bucket
boundaries. The result is row-identical to the single-window plan for any
bucket width:

  phase 1 (per event, window on (user, bucket)):
      within_flag  = first event in bucket, or gap from previous > G
      within_idx   = running sum of within_flag  (session # within bucket)
  phase 2 (per (user, bucket) aggregate — |buckets| rows, not |events|):
      merge_b      = bucket's first event continues the previous non-empty
                     bucket's last session (boundary gap <= G)
      sessions_before = running sum of (k_b - merge_b) over prior buckets
  stitch (join back on (user, bucket) — co-partitioned with phase 1):
      session_id   = sessions_before + within_idx - merge_b

The stitch is exact across empty buckets (phase 2 orders by bucket and
compares against the previous NON-EMPTY bucket) and for sessions spanning
3+ buckets (each boundary contributes one merge). No bucket-width
correctness constraint exists; width tunes performance only — it should
comfortably exceed the gap so merges stay rare, while keeping the hottest
key's per-bucket volume task-sized.

Reference has no sessionization (SURVEY.md §2 "not present"); this is a
first-class extension for the events table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import interval_micros, validate_interval

_FLAG = "__sess_flag"
_IDX = "__sess_idx"
_BUCKET = "__sess_bucket"


def _new_session_flag(prev_ts: Column, ts: Column, gap: str) -> Column:
    return F.when(
        prev_ts.isNull() | ((ts - prev_ts) > F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_cols: Sequence[str] = (),
    bucket: str | None = None,
) -> DataFrame:
    """Assign a per-user 1-based ``session_id`` to every event.

    A new session starts when the gap from the previous event of the same
    user exceeds ``gap`` (a SQL interval string). ``order_cols`` break
    timestamp ties deterministically (e.g. an event id).

    ``bucket=None`` uses the single-window plan (one shuffle on
    ``user_col``). ``bucket="6 hours"`` switches to the two-phase
    composite-key plan described in the module docstring — identical
    output, skew-proof windows. Pick a bucket comfortably larger than
    ``gap``.
    """
    validate_interval(gap, "gap", "sessionize")
    if bucket is not None:
        validate_interval(bucket, "bucket", "sessionize")
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]

    if bucket is None:
        w = Window.partitionBy(user_col).orderBy(*order)
        flag = _new_session_flag(F.lag(ts_col).over(w), F.col(ts_col), gap)
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(_FLAG, flag).withColumn(
            "session_id", F.sum(_FLAG).over(run).cast("bigint")
        ).drop(_FLAG)

    bucket_us = interval_micros(bucket)
    ev = df.withColumn(
        _BUCKET, F.floor(F.unix_micros(F.col(ts_col)) / bucket_us).cast("bigint")
    )

    # Phase 1: windows on (user, bucket) — bounded by bucket width.
    wb = Window.partitionBy(user_col, _BUCKET).orderBy(*order)
    flag = _new_session_flag(F.lag(ts_col).over(wb), F.col(ts_col), gap)
    run = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = ev.withColumn(_FLAG, flag).withColumn(
        _IDX, F.sum(_FLAG).over(run).cast("bigint")
    )

    # Phase 2: one row per (user, bucket) — |buckets|, not |events|.
    agg = ev.groupBy(user_col, _BUCKET).agg(
        F.sum(_FLAG).alias("__k"),
        F.min_by(F.col(ts_col), F.struct(*order)).alias("__first_ts"),
        F.max_by(F.col(ts_col), F.struct(*order)).alias("__last_ts"),
    )
    wu = Window.partitionBy(user_col).orderBy(_BUCKET)
    prev_last = F.lag("__last_ts").over(wu)
    agg = agg.withColumn(
        "__merge",
        F.when(
            prev_last.isNotNull()
            & ((F.col("__first_ts") - prev_last) <= F.expr(f"INTERVAL {gap}")),
            F.lit(1),
        ).otherwise(F.lit(0))
        .cast("bigint"),
    )
    before = wu.rowsBetween(Window.unboundedPreceding, -1)
    agg = agg.select(
        user_col,
        _BUCKET,
        "__merge",
        F.coalesce(
            F.sum(F.col("__k") - F.col("__merge")).over(before), F.lit(0)
        ).alias("__sessions_before"),
    )

    # Stitch: join on (user, bucket) — same keys phase 1 shuffled on.
    out = ev.join(agg, [user_col, _BUCKET]).withColumn(
        "session_id",
        (F.col("__sessions_before") + F.col(_IDX) - F.col("__merge")).cast("bigint"),
    )
    return out.drop(_FLAG, _IDX, _BUCKET, "__merge", "__sessions_before")


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup of ``sessionize`` output: event count, bounds,
    duration in seconds. One partial-agg-friendly groupBy."""
    return sessions.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1e6
        ).alias("duration_sec"),
    )


def session_window_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN ``session_window`` grouping
    — the Catalyst-native formulation of ``operators.sessionize`` (merging
    session windows inside the aggregation, no lag/running-sum window
    pass). Returns (user, session_start, session_end_ts, n_events) where
    session_end_ts is the LAST EVENT's timestamp (the window's exclusive
    end minus the gap), making the output gap-independent and directly
    comparable to the lag-window formulation.

    Works on batch and streaming frames alike; on streams the aggregation
    is watermark-evicted state — the built-in counterpart of
    ``streaming.incremental.finalized_sessions``.
    """
    validate_interval(gap, "gap", "session_window_stats")
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap}")).alias("session_end_ts"),
            "n_events",
        )
    )
