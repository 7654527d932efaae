"""Range (interval-containment) join: match points to intervals containing
them without a cross-join.

The reference has no range join (SURVEY.md §2 "not present"); this is a
first-class extension. Spark's optimizer executes a plain
``lo <= p AND p < hi`` join as BroadcastNestedLoopJoin — O(points ×
intervals) comparisons. The scale-safe composition is bin bucketing:

    intervals explode to the fixed-width bins they overlap
    points compute their single containing bin
    join on bin equality with the exact containment as residual condition

Catalyst plans the bin equality as the hash-join key (broadcast or
shuffled) and evaluates containment as the join residual, so left-outer
semantics come out exactly right with no extra passes.

Scale design (100 TB): one shuffle each side (none for the interval side
when broadcast). Work per point is bounded by intervals overlapping its
bin, not total intervals. ``bin_width`` trades replication (each interval
copies to ``len/width + 1`` bins) against candidate fan-in; pick it near
the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PBIN = "__range_pbin"
_IBIN = "__range_ibin"


def _bin_of(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
    broadcast_intervals: bool = False,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with ``lo <= point < hi``.

    ``how='inner'`` keeps matches only; ``'left'`` also keeps points in no
    interval (null interval columns). Column names must be disjoint across
    the two inputs.

    An interval replicates to ``(hi-lo)/bin_width + 1`` bins — an
    open-ended sentinel bound (``hi = 1e9``) would silently explode into
    millions of rows, so intervals wider than ``max_bins_per_interval``
    bins fail fast; bound such intervals to the data's range (or raise
    ``bin_width``) instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: bad how {how!r}")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"interval_join: overlapping column names: {sorted(clash)}")

    lo, hi, p = F.col(lo_col), F.col(hi_col), F.col(point_col)
    n_bins = _bin_of(hi, bin_width) - _bin_of(lo, bin_width) + 1
    guarded_hi_bin = F.when(
        n_bins <= F.lit(max_bins_per_interval), _bin_of(hi, bin_width)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: an interval spans %s bins (> max_bins_per_interval="
                f"{max_bins_per_interval}); bound the interval or raise bin_width",
                n_bins.cast("string"),
            )
        )
    )
    exploded = intervals.withColumn(
        _IBIN,
        F.explode(F.sequence(_bin_of(lo, bin_width), guarded_hi_bin)),
    )
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    binned_points = points.withColumn(_PBIN, _bin_of(p, bin_width))

    cond = (F.col(_PBIN) == F.col(_IBIN)) & (lo <= p) & (p < hi)
    return binned_points.join(exploded, cond, how).drop(_PBIN, _IBIN)
