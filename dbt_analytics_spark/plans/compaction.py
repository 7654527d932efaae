"""Small-file compaction for incremental / microbatch tables.

The reference's incremental materializations (and this engine's
``append`` / ``microbatch`` strategies) accumulate one-or-more files per
run; at 100 TB a year of hourly microbatches is ~10^5 files per table,
and scan cost becomes dominated by file-open overhead and tiny row
groups rather than bytes (the classic small-files problem — the same
operation Delta/Iceberg expose as OPTIMIZE / rewrite_data_files; no dbt
analog, documented extension).

Spark shape: read the table, re-balance to ``ceil(bytes / target)``
output files, write to a staging table, atomic-swap over the target —
the same tmp→swap dance as plans/materialize.py's incremental rewrite.
Partitioned tables keep their layout (repartition on the partition
columns, so each output partition gets coherent files); an optional
``sort_by`` range-clusters rows so parquet min/max footer stats enable
data skipping on those columns (Z-order-lite, single dimension order).

File sizes come from the table's input files via the Hadoop FileSystem
API — works on any scheme Spark can read (file://, hdfs://, s3a://); no
driver-side data movement, just metadata.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_file_stats(spark: SparkSession, table: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a catalog table's current data files."""
    files = spark.table(table).inputFiles()
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(conf)
        total += fs.getFileStatus(path).getLen()
    return len(files), total


def _partition_columns(spark: SparkSession, table: str) -> list[str]:
    return [
        c.name for c in spark.catalog.listColumns(table) if c.isPartition
    ]


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite ``table`` into ~``target_file_bytes``-sized files.

    Returns a report dict: files/bytes before and after plus whether a
    rewrite happened. No-ops (and says so) when the table already has
    fewer than ``min_files_to_compact`` files or is within 2× of the
    target file count — compaction must be cheap to call repeatedly from
    a scheduler.

    ``target_file_bytes`` counts the CURRENT on-disk (compressed) bytes,
    so the output files land near the target without decompress-ratio
    guesswork. 128 MB default matches the usual parquet split size:
    one scan task per file downstream.
    """
    n_files, total_bytes = table_file_stats(spark, table)
    report = {
        "table": table,
        "files_before": n_files,
        "bytes_before": total_bytes,
        "compacted": False,
    }
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_files < min_files_to_compact or n_files <= 2 * n_target:
        return report

    df = spark.table(table)
    parts = _partition_columns(spark, table)
    if sort_by:
        # Range-cluster so each output file covers a narrow sort_by slice:
        # parquet footer min/max then prune files on those predicates.
        balanced = df.repartitionByRange(
            n_target, *[F.col(c) for c in (parts + sort_by)]
        ).sortWithinPartitions(*(parts + sort_by))
    elif parts:
        # Keep partition-dir coherence: rows of one Hive partition land in
        # few tasks, so each partition dir gets ~its share of files, not
        # n_target fragments from every task.
        balanced = df.repartition(n_target, *[F.col(c) for c in parts])
    else:
        balanced = df.repartition(n_target)

    staging = f"{table}__compact_tmp"
    writer = balanced.write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.saveAsTable(staging)
    try:
        swap = spark.table(staging).write.mode("overwrite")
        if parts:
            swap = swap.partitionBy(*parts)
        swap.saveAsTable(table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {staging}")

    files_after, bytes_after = table_file_stats(spark, table)
    report.update(
        compacted=True, files_after=files_after, bytes_after=bytes_after
    )
    return report
