"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``dbt_analytics_spark`` package; this module is
a thin adapter over its query catalog (dbt_analytics_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_analytics_spark import queries as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_analytics_spark.queries.core import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-data-pipeline extension set)."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted for non-SQL-expressible
    ops — MinHash/SimHash/LSH sketches and mapInPandas plumbing)."""
    return _catalog.oracle_sql()
