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
latest right row), so memory is O(1) per partition stream. Skewed keys are
split by AQE like any other window/shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RSTRUCT = "__asof_right"

# Interval strings are interpolated into F.expr, so validate the shape up
# front: "<number> <unit>" pairs, e.g. "2 hours" or "1 day 30 minutes".
# A malformed value otherwise surfaces as an opaque Catalyst parse error
# far from the call site (and would accept arbitrary SQL fragments).
_TOLERANCE_RE = re.compile(
    r"(?i)\s*(?:'?\d+(?:\.\d+)?'?\s+"
    r"(?:year|month|week|day|hour|minute|second|millisecond|microsecond)s?\s*)+"
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    direction: str = "backward",
    how: str = "left",
    tolerance: str | int | float | None = None,
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
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    t: Column = F.col(time_col).asc() if direction == "backward" else F.col(time_col).desc()
    # Right rows (side 0) sort before left rows at equal timestamps, making
    # the match inclusive at the boundary in both directions.
    w = (
        Window.partitionBy(*by)
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
    return out.drop(_SIDE, _RSTRUCT)
