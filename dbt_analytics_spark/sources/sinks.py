"""Sharded JSONL export — the delivery end of a training-data pipeline.

Counterpart of ``readers.read_jsonl``: write a cleaned/packed corpus as
``n_shards`` JSONL shard directories (one JSON object per line, Spark's
native json sink) with a machine-readable manifest. Shard membership is
deterministic — ``pmod(xxhash64(key), n_shards)`` — so re-running the
export on the same data reproduces identical shard membership regardless
of input partitioning, and downstream loaders can address shards stably.

Layout: ``path/shard=K/part-*.jsonl`` — all rows of a shard are
co-located into one task before the write (hash repartition on the shard
value), so every shard directory holds exactly ONE data file. The
manifest pass is file metadata only (Hadoop FileSystem), no data
re-read.

Scale shape: one hash-partition shuffle, then a straight parallel write,
one task per shard; pick ``n_shards`` ≈ data bytes / desired shard size.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    compression: str | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` JSONL shard dirs under ``path`` plus a
    ``manifest.json``. Returns the manifest dict: total rows, per-shard
    row counts, one data file per shard with byte sizes.

    ``key_col`` drives deterministic shard assignment (use the document
    id). Rows with NULL keys raise — a silent hash(NULL) bucket would
    concentrate them all in one shard.
    """
    if n_shards <= 0:
        raise ValueError("write_jsonl_shards: n_shards must be positive")
    if key_col not in df.columns:
        raise ValueError(f"write_jsonl_shards: unknown key_col {key_col!r}")
    if "shard" in df.columns:
        raise ValueError("write_jsonl_shards: df already has a 'shard' column")

    spark = df.sparkSession
    # Persist the sharded frame: the null-key probe, the per-shard counts,
    # and the write would otherwise each re-execute the (often expensive)
    # upstream pipeline — and a nondeterministic upstream could make the
    # manifest counts disagree with the files actually written.
    sharded = df.withColumn(
        "shard",
        F.when(
            F.col(key_col).isNotNull(),
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int"),
        ),
    ).persist()
    try:
        shard_counts = {
            r["shard"]: r["n"]
            for r in sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if None in shard_counts:
            raise ValueError(
                f"write_jsonl_shards: NULL values in key_col {key_col!r}"
            )
        shard_counts = {int(k): v for k, v in shard_counts.items()}
        # Co-locate each shard into one task: all rows of shard K hash the
        # same, so K lands whole in one partition (collisions only merge
        # TASKS, never split a shard across files).
        writer = (
            sharded.repartition(n_shards, F.col("shard"))
            .write.mode("overwrite")
            .partitionBy("shard")
        )
        if compression:
            writer = writer.option("compression", compression)
        writer.json(path)
    finally:
        sharded.unpersist()

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    files = {}
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("shard="):
            continue
        shard = int(name.split("=", 1)[1])
        parts = [
            s
            for s in fs.listStatus(status.getPath())
            if s.getPath().getName().startswith("part-")
        ]
        assert len(parts) == 1, f"shard {shard}: {len(parts)} files"
        files[shard] = {
            "file": f"{name}/{parts[0].getPath().getName()}",
            "bytes": parts[0].getLen(),
            "rows": int(shard_counts.get(shard, 0)),
        }

    manifest = {
        "format": "jsonl",
        "n_shards": n_shards,
        "key_col": key_col,
        "total_rows": int(sum(shard_counts.values())),
        "shards": {str(k): v for k, v in sorted(files.items())},
    }
    # Write through the SAME Hadoop FileSystem as the data (a local open()
    # would break every non-local destination — s3a://, hdfs:// — after
    # the corpus had already been exported).
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(root, "manifest.json"), True
    )
    try:
        out.write(bytearray(json.dumps(manifest, indent=2, sort_keys=True).encode()))
    finally:
        out.close()
    return manifest
