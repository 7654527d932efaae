"""Seed loading: typed CSV → table.

The reference loads seed CSVs with agate type inference (Number, Date,
ISODateTime, Boolean, Text) and batched INSERTs (reference:
dbt-env/Lib/site-packages/dbt_common/clients/agate_helper.py:29-74,
dbt/include/global_project/macros/materializations/seeds/helpers.sql:6-130).

Spark-first equivalent: ``spark.read.csv(header=True, inferSchema=True)`` —
schema inference plays agate's role, and a single distributed write replaces
10k-row INSERT batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_seed_csv(
    spark: SparkSession,
    path: str,
    column_types: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """Read a seed CSV with inferred schema, with optional per-column
    overrides (dbt's ``+column_types`` seed config equivalent).

    Empty strings become NULLs, matching agate/Postgres seed behavior where
    empty CSV cells load as NULL (e.g. merchant_regex.csv's empty
    active_from/active_to columns).
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    if column_types:
        for col_name, dtype in column_types.items():
            df = df.withColumn(col_name, df[col_name].cast(dtype))
    return df
