"""Source freshness checks (dbt `source freshness` equivalent).

Reference: the engine computes ``max(loaded_at_field)`` per source and
compares its age against warn/error thresholds
(/root/reference/dbt-env/Lib/site-packages/dbt/task/freshness.py; SQL in
.../include/global_project/macros/adapters/freshness.sql). Here it is a
single distributed ``max`` aggregate — no full scan of column values
reaches the driver.

``now`` is injectable for deterministic tests (the engine-wide pinned-clock
rule: SURVEY.md §5 "current_date must be injectable").
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FreshnessResult:
    max_loaded_at: datetime | None
    age: timedelta | None
    status: str  # "pass" | "warn" | "error" (error also covers empty source)


def check_freshness(
    df: DataFrame,
    loaded_at_col: str,
    warn_after: timedelta | None = None,
    error_after: timedelta | None = None,
    now: datetime | None = None,
) -> FreshnessResult:
    """Age of the newest row vs warn/error thresholds.

    The aggregate pushes down to a parquet-footer max where statistics
    allow; only one scalar returns to the driver.
    """
    row = df.agg(F.max(loaded_at_col).alias("m")).collect()[0]
    max_loaded = row["m"]
    if max_loaded is None:
        return FreshnessResult(None, None, "error")
    if now is None:
        now = datetime.now(timezone.utc)
    ts = max_loaded
    if isinstance(ts, datetime) and ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    age = now - ts
    status = "pass"
    if error_after is not None and age > error_after:
        status = "error"
    elif warn_after is not None and age > warn_after:
        status = "warn"
    return FreshnessResult(max_loaded, age, status)
