"""Shared operator utilities."""

from __future__ import annotations

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
