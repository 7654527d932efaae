"""One-pass table profiling: per-column stats for catalog/docs surfaces.

dbt's docs generate collects per-relation stats where the adapter provides
them; this is the engine-native version: a SINGLE aggregation pass emits
row count, null count, distinct count, min/max and total string length for
every requested column — the pre-flight screen for schema drift, null
explosions, and cardinality surprises in a training-data pipeline.

Scale shape: ONE job, map-side partial aggregation; no per-column scans.
``approx=True`` (the 100 TB default) uses ``approx_count_distinct``
(HLL++, constant-size partials); ``approx=False`` is the exact variant
the DuckDB oracle replays (f4_profile) — exact multi-column distincts
expand the aggregate (one shuffle per distinct column set internally),
acceptable at verification scale, not the cluster default. The final
unpivot is ``inline`` over a one-row aggregate — no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = True,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct, min_v,
    max_v, sum_len). min/max compare in the column's native type and are
    cast to string for the uniform schema; sum_len is the total length of
    the string form (an exact, integer-valued width signal — emitted as a
    sum, not an average, so cross-engine float drift cannot occur)."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(F.col(c))
        )
        aggs.append(
            F.struct(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_null"),
                distinct.cast("bigint").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_v"),
                F.max(F.col(c)).cast("string").alias("max_v"),
                F.sum(F.length(F.col(c).cast("string")))
                .cast("bigint")
                .alias("sum_len"),
            ).alias(f"__st_{c}")
        )
    row = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__st_{c}.n_null").alias("n_null"),
            F.col(f"__st_{c}.n_distinct").alias("n_distinct"),
            F.col(f"__st_{c}.min_v").alias("min_v"),
            F.col(f"__st_{c}.max_v").alias("max_v"),
            F.col(f"__st_{c}.sum_len").alias("sum_len"),
        )
        for c in cols
    ]
    return row.select(F.inline(F.array(*rows)))
