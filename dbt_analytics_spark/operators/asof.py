"""As-of (temporal) join: match each left row to the nearest right row at or
before (backward) / at or after (forward) its timestamp, per key.

The reference has no as-of operator (SURVEY.md §2 "not present"); this is a
first-class extension for event/feature pipelines. Spark has no ASOF JOIN
builtin, so it is composed from existing operators — the idiomatic rewrite:

    union(tagged left, tagged right) → window last(right_struct) → filter left

Scale design (100 TB): exactly ONE shuffle, on the by-keys — identical cost
to the groupBy any aggregation of the same data would pay. No range
explosion, no per-left-row candidate set (a naive theta join is
O(left × right-per-key)). Window state is a single struct (the running
latest right row), so memory is O(1) per partition stream.

Skew: AQE splits skewed *joins*, never window partitions, so one hot key
(a bot/whale user owning 20% of events) serializes its whole history
through a single task — measured in ``skew_probe.py`` / BENCH_NOTES.md
"Round-6 skew probe". ``time_bucket=...`` is the mitigation: a two-phase
plan whose per-event windows key on ``(by, time_bucket)`` — bounded by
bucket width regardless of per-key volume — plus a per-BUCKET seed pass
(running edge-struct over the |buckets|-sized timeline, not the events)
that carries the latest/earliest right row across bucket boundaries.
Output is row-identical to the single-phase plan for any bucket width.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import INTERVAL_RE, interval_micros

_SIDE = "__asof_side"
_RSTRUCT = "__asof_right"

# Interval validation/length helpers shared with sessionize: operators/util.py.
_TOLERANCE_RE = INTERVAL_RE


_BUCKET = "__asof_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    direction: str = "backward",
    how: str = "left",
    tolerance: str | int | float | None = None,
    time_bucket: str | int | float | None = None,
) -> DataFrame:
    """Join each left row to the nearest right row in time, per ``by`` key.

    - ``backward``: latest right row with ``r.time <= l.time`` (inclusive).
    - ``forward``: earliest right row with ``r.time >= l.time`` (inclusive).
    - ``how``: ``left`` keeps unmatched left rows (null value_cols);
      ``inner`` drops them.
    - ``tolerance``: maximum allowed time distance for a match (pandas
      ``merge_asof(tolerance=...)``): a SQL interval string (``"2 hours"``)
      for temporal time columns, or a number for numeric ones. A nearest
      row farther than the tolerance counts as NO match. Applied as a
      row-local post-filter, so the one-shuffle plan shape is unchanged.
    - ``time_bucket``: switches to the skew-proof two-phase plan (module
      docstring): per-event windows key on ``(by, bucket)`` and a
      per-bucket seed pass stitches matches across bucket boundaries.
      Interval string (``"1 day"``) for temporal time columns, a number
      (bucket width) for numeric ones — mirroring ``tolerance``.
      Identical output for any width. Use when a ``by`` key can be hot
      enough that one window partition would not fit a task.

    ``value_cols`` are the right-side columns to carry over; they must not
    collide with left column names. All carried columns come from the SAME
    matched right row (they propagate as one struct, so per-column nulls in
    the right data can't mix rows). If ``right`` can contain duplicate
    ``(by, time)`` rows, pre-aggregate it for a deterministic winner.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: bad how {how!r}")
    by = list(by)
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: value_cols collide with left columns: {sorted(clash)}")

    backward = direction == "backward"
    l_tagged = left.withColumn(_SIDE, F.lit(1))
    # The matched right row's own timestamp rides inside the struct so a
    # tolerance bound can be evaluated after the window pass.
    r_tagged = (
        right.select(*by, time_col, *value_cols)
        .withColumn(
            _RSTRUCT,
            F.struct(
                F.col(time_col).alias("__asof_t"),
                *[F.col(c) for c in value_cols],
            ),
        )
        .drop(*value_cols)
        .withColumn(_SIDE, F.lit(0))
    )

    if time_bucket is None:
        u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
        t: Column = F.col(time_col).asc() if backward else F.col(time_col).desc()
        # Right rows (side 0) sort before left rows at equal timestamps,
        # making the match inclusive at the boundary in both directions.
        w = (
            Window.partitionBy(*by)
            .orderBy(t, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(_RSTRUCT, F.last(_RSTRUCT, ignorenulls=True).over(w))
    else:
        # Interval string for temporal time columns; plain number for
        # numeric ones (mirrors the tolerance contract). Validate here so
        # a mismatch fails with a named error, not a Catalyst cast error.
        time_type = left.schema[time_col].dataType.simpleString()
        temporal = time_type.startswith(("timestamp", "date"))
        if isinstance(time_bucket, str):
            if not temporal:
                raise ValueError(
                    f"asof_join: interval time_bucket {time_bucket!r} needs a "
                    f"temporal time_col, got {time_col!r}: {time_type}"
                )
            if not _TOLERANCE_RE.fullmatch(time_bucket.strip()):
                raise ValueError(
                    f"asof_join: bad time_bucket {time_bucket!r} — expected an "
                    "interval string like '1 day' or a number for numeric "
                    "time columns"
                )
            bucket = F.floor(
                F.unix_micros(F.col(time_col)) / interval_micros(time_bucket)
            ).cast("bigint")
        else:
            if temporal:
                raise ValueError(
                    f"asof_join: numeric time_bucket {time_bucket!r} needs a "
                    f"numeric time_col, got {time_col!r}: {time_type}"
                )
            if time_bucket <= 0:
                raise ValueError("asof_join: time_bucket must be positive")
            bucket = F.floor(F.col(time_col) / F.lit(time_bucket)).cast("bigint")
        l_tagged = l_tagged.withColumn(_BUCKET, bucket)
        r_tagged = r_tagged.withColumn(_BUCKET, bucket)

        # Seed pass over the (by, bucket) TIMELINE — |buckets| rows, never
        # |events|: per right bucket its edge struct (latest row for
        # backward / earliest for forward), full-joined against the set of
        # left buckets so a left bucket with no in-bucket right rows still
        # receives the carried match from across the boundary.
        edge_of = F.max_by if backward else F.min_by
        r_edges = r_tagged.groupBy(*by, _BUCKET).agg(
            edge_of(F.col(_RSTRUCT), F.col(time_col)).alias("__edge")
        )
        l_buckets = l_tagged.select(*by, _BUCKET).distinct()
        timeline = l_buckets.join(r_edges, [*by, _BUCKET], "full")
        wt = Window.partitionBy(*by).orderBy(_BUCKET)
        seed = (
            F.last("__edge", ignorenulls=True).over(
                wt.rowsBetween(Window.unboundedPreceding, -1)
            )
            if backward
            else F.first("__edge", ignorenulls=True).over(
                wt.rowsBetween(1, Window.unboundedFollowing)
            )
        )
        seeds = (
            timeline.withColumn(_RSTRUCT, seed)
            .filter(F.col(_RSTRUCT).isNotNull())
            .select(*by, _BUCKET, _RSTRUCT)
            .withColumn(_SIDE, F.lit(0))
        )

        # Per-event window keys on (by, bucket): bounded by bucket width.
        # Seeds carry a NULL time_col and sort before every real row of
        # their bucket (nulls first in the scan direction); at equal
        # timestamps right rows (side 0) still sort before left rows.
        u = l_tagged.unionByName(r_tagged, allowMissingColumns=True).unionByName(
            seeds, allowMissingColumns=True
        )
        t = (
            F.col(time_col).asc_nulls_first()
            if backward
            else F.col(time_col).desc_nulls_first()
        )
        w = (
            Window.partitionBy(*by, _BUCKET)
            .orderBy(t, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(_RSTRUCT, F.last(_RSTRUCT, ignorenulls=True).over(w))

    out = matched.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        if isinstance(tolerance, str):
            if not _TOLERANCE_RE.fullmatch(tolerance.strip()):
                raise ValueError(
                    f"asof_join: bad tolerance {tolerance!r} — expected an "
                    "interval string like '2 hours' or '1 day 30 minutes'"
                )
            bound = F.expr(f"INTERVAL {tolerance}")
        else:
            bound = F.lit(tolerance)
        gap = (
            F.col(time_col) - F.col(_RSTRUCT)["__asof_t"]
            if direction == "backward"
            else F.col(_RSTRUCT)["__asof_t"] - F.col(time_col)
        )
        out = out.withColumn(
            _RSTRUCT, F.when(gap <= bound, F.col(_RSTRUCT))
        )
    if how == "inner":
        out = out.filter(F.col(_RSTRUCT).isNotNull())
    for c in value_cols:
        out = out.withColumn(c, F.col(_RSTRUCT)[c])
    return out.drop(_SIDE, _RSTRUCT, _BUCKET)
