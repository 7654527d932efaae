"""Shared operator utilities."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy per-row work
    (shingling, hashing, vector math).

    A small parquet file arrives as ONE input split, so everything downstream
    runs on one core no matter how wide the cluster is. Repartition only when
    the input has fewer partitions than ``defaultParallelism`` — on a real
    100 TB table (thousands of splits) this is a no-op and adds no shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


#: "<number> <unit>" interval strings, e.g. "2 hours" or "1 day 30 minutes".
#: Validated BEFORE interpolation into F.expr(f"INTERVAL {...}") — an
#: unvalidated value surfaces as an opaque Catalyst parse error far from
#: the call site and would accept arbitrary SQL fragments.
INTERVAL_RE = re.compile(
    r"(?i)\s*(?:'?\d+(?:\.\d+)?'?\s+"
    r"(?:year|month|week|day|hour|minute|second|millisecond|microsecond)s?\s*)+"
)


def validate_interval(value: str, param: str, fn: str) -> str:
    """Validate an interval string; raise a named ValueError at the call
    site instead of an opaque Catalyst parse error."""
    if not INTERVAL_RE.fullmatch(value.strip()):
        raise ValueError(
            f"{fn}: bad {param} {value!r} — expected an interval string "
            "like '2 hours' or '1 day 30 minutes'"
        )
    return value


def interval_micros(interval: str):
    """Length of a SQL interval string in microseconds (JVM-side constant,
    evaluated against the epoch base — fixed-width micros, so calendar
    units like 'month' mean their length starting 1970-01-01)."""
    from pyspark.sql import functions as F

    base = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return F.unix_micros(base + F.expr(f"INTERVAL {interval}")) - F.unix_micros(base)


#: Fixed-width interval units in microseconds (driver-side arithmetic).
_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def interval_micros_int(interval: str) -> int:
    """Driver-side integer length of a fixed-width SQL interval string —
    the same compound/fractional grammar ``validate_interval`` accepts
    ('30 minutes', '1.5 hours', '1 day 30 minutes'). Calendar units
    (month/year) are rejected — they have no fixed micros width; the
    Column-returning ``interval_micros`` handles those against an epoch
    base."""
    if not INTERVAL_RE.fullmatch(interval.strip()):
        raise ValueError(
            f"interval_micros_int: bad interval {interval!r} — expected a "
            "string like '2 hours' or '1 day 30 minutes'"
        )
    total = 0.0
    for num, unit in re.findall(
        r"'?(\d+(?:\.\d+)?)'?\s+([a-zA-Z]+?)s?\b", interval
    ):
        u = unit.lower()
        if u not in _UNIT_US:
            raise ValueError(
                f"interval_micros_int: {u!r} is calendar-width, not fixed — "
                f"cannot convert {interval!r} to micros"
            )
        total += float(num) * _UNIT_US[u]
    return int(round(total))


def segment_window(df, part_cols: list[str], segment_tokens: int, carry: int):
    """Long-sequence window-skew guard, shared by the gram/bigram family.

    ``df`` must carry a ``pos`` ordering column. Returns (keyed_df,
    window): rows are re-keyed on ``(part_cols..., __seg)`` where
    ``__seg = pos div S``, and each segment's first ``carry`` rows are
    ALSO emitted into the previous segment (``__back = 1`` duplicates) so
    windows spanning a boundary still assemble; consumers drop rows whose
    window output STARTS at a carried-back duplicate
    (``filter(__back == 0)``) to keep the output row-identical to the
    unsegmented plan. Spark never splits a window partition, so this
    bounds any one task at S + carry rows regardless of how pathological
    a single document/key is.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    S = segment_tokens
    keyed = df.select(
        *part_cols,
        "pos",
        *[c for c in df.columns if c not in part_cols and c != "pos"],
        F.explode(
            F.when(
                ((F.col("pos") % S) < carry) & (F.col("pos") >= S),
                F.array(F.lit(0), F.lit(1)),
            ).otherwise(F.array(F.lit(0)))
        ).alias("__back"),
    ).withColumn("__seg", F.floor(F.col("pos") / S) - F.col("__back"))
    w = Window.partitionBy(*part_cols, "__seg").orderBy("pos")
    return keyed, w
