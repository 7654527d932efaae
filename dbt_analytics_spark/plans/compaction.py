"""Small-file compaction for incremental / microbatch tables.

The reference's incremental materializations (and this engine's
``append`` / ``microbatch`` strategies) accumulate one-or-more files per
run; at 100 TB a year of hourly microbatches is ~10^5 files per table,
and scan cost becomes dominated by file-open overhead and tiny row
groups rather than bytes (the classic small-files problem — the same
operation Delta/Iceberg expose as OPTIMIZE / rewrite_data_files; no dbt
analog, documented extension).

Spark shape: read the table, re-balance to ``ceil(bytes / target)``
output files, write ONCE to a staging table, then swap via two metadata
operations (DROP old + RENAME staging) — no second data rewrite, and a
crash between the two leaves the full compacted copy intact under the
staging name (the error message names it).
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
    """(file_count, total_bytes) of a catalog table's current data files.

    One ``listStatus`` RPC per PARENT DIRECTORY (not per file): a
    10^5-file microbatch table has ~10^3 partition dirs, so the metadata
    pass stays cheap enough to run from a scheduler before every
    compaction check."""
    files = spark.table(table).inputFiles()
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    wanted = set(files)
    parents = {f.rsplit("/", 1)[0] for f in files}
    total = 0
    seen = 0
    for d in sorted(parents):
        dpath = jvm.org.apache.hadoop.fs.Path(d)
        fs = dpath.getFileSystem(conf)
        for status in fs.listStatus(dpath):
            # inputFiles URIs and listStatus URIs may differ in scheme
            # normalization; compare on the tail the table reported.
            uri = status.getPath().toString()
            if uri in wanted or f"file:{status.getPath().toUri().getPath()}" in wanted:
                total += status.getLen()
                seen += 1
    if seen != len(files):
        # Fall back to exact per-file stats if URI normalization missed
        # anything (correctness beats the RPC saving).
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

    # Data is written ONCE (to the staging table); the swap is two
    # metadata operations (drop + rename), not a second rewrite. A crash
    # between them loses no data: the full compacted copy survives under
    # the staging name, and the error says so. Never drop staging on
    # failure — that would delete the only intact copy.
    staging = f"{table}__compact_tmp"
    writer = balanced.write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.saveAsTable(staging)
    try:
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        if parts:
            # Hive's rename moves the table directory but keeps partition
            # metadata pointing at the old staging paths; SYNC drops the
            # stale entries and re-registers from the actual directories.
            spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    except Exception as exc:
        raise RuntimeError(
            f"compact_table: swap failed after writing the compacted copy; "
            f"the data is intact in {staging!r} (and {table!r} if the DROP "
            f"had not run). Recover by renaming manually."
        ) from exc

    files_after, bytes_after = table_file_stats(spark, table)
    report.update(
        compacted=True, files_after=files_after, bytes_after=bytes_after
    )
    return report
