"""Date-spine generator.

Reference: ``generate_series('2022-01-01'::date, current_date + interval
'2 months', interval '1 month')`` (models/metrics_monthly.sql:9; weekly /
quarterly / yearly variants in metrics_weekly.sql:9, metrics_quarterly.sql:9)
and dbt's cross-db ``date_spine`` macro
(dbt-env/.../macros/utils/date_spine.sql:1-31).

Spark-first: ``sequence()`` + ``explode`` — a single-row seed expanded
JVM-side; no driver loop, no Python. The "today" bound is injectable so runs
are deterministic (SURVEY.md §5 determinism note on current_date).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GRAIN_INTERVAL = {
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
    "quarter": "interval 3 months",
    "year": "interval 1 year",
}


def date_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    grain: str = "month",
    col_name: str = "period_start",
) -> DataFrame:
    """Dense calendar of period starts in ``[start, end]`` at ``grain``."""
    interval = _GRAIN_INTERVAL[grain]
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(str(start)).cast("date"),
                    F.lit(str(end)).cast("date"),
                    F.expr(interval),
                )
            ).alias(col_name)
        )
    )
