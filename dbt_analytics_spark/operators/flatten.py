"""CSV-in-cell flattening (lateral UNNEST).

Reference: ``FROM t, UNNEST(string_to_array(col, ','))``
(models/exercise_log_flattened.sql:6-7, models/recipe_log_flattened.sql:5-6).

Spark-first: ``split`` + ``explode`` — a generator expression inside
whole-stage codegen; one-to-many expansion without any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_csv_cell(
    df: DataFrame,
    col: str | Column,
    out_col: str,
    sep: str = ",",
    trim: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """Explode a delimiter-separated cell into one row per element."""
    c = F.col(col) if isinstance(col, str) else col
    element = F.explode(F.split(c, sep)).alias(out_col)
    out = df.select("*", element)
    if trim:
        out = out.withColumn(out_col, F.trim(F.col(out_col)))
    if drop_empty:
        out = out.filter(F.col(out_col) != "")
    return out
