"""write_jsonl_shards: round-trip fidelity, deterministic shard layout,
one file per shard, manifest accuracy, validation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.sources.sinks import write_jsonl_shards


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.md5(F.col("id").cast("string"))).alias("text"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "export")
    df = _docs(spark)
    manifest = write_jsonl_shards(df, out, n_shards=8, key_col="doc_id")

    assert manifest["total_rows"] == 500
    assert sum(s["rows"] for s in manifest["shards"].values()) == 500
    # One data file per shard, bytes recorded.
    for s in manifest["shards"].values():
        assert s["file"].startswith("shard=") and s["bytes"] > 0
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk["total_rows"] == 500

    back = spark.read.json(out)
    assert back.count() == 500
    orig = {(r["doc_id"], r["text"]) for r in df.collect()}
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == orig


def test_deterministic_across_partitioning(spark, tmp_path):
    df = _docs(spark, 300)
    m1 = write_jsonl_shards(df, str(tmp_path / "a"), n_shards=4, key_col="doc_id")
    m2 = write_jsonl_shards(
        df.repartition(17), str(tmp_path / "b"), n_shards=4, key_col="doc_id"
    )
    assert {k: v["rows"] for k, v in m1["shards"].items()} == {
        k: v["rows"] for k, v in m2["shards"].items()
    }
    # Same doc lands in the same shard either way.
    a = spark.read.json(str(tmp_path / "a")).select("doc_id", "shard")
    b = spark.read.json(str(tmp_path / "b")).select("doc_id", "shard")
    assert {(r["doc_id"], r["shard"]) for r in a.collect()} == {
        (r["doc_id"], r["shard"]) for r in b.collect()
    }


def test_validation(spark, tmp_path):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="positive"):
        write_jsonl_shards(df, str(tmp_path / "x"), 0, "doc_id")
    with pytest.raises(ValueError, match="unknown key_col"):
        write_jsonl_shards(df, str(tmp_path / "x"), 2, "nope")
    with_null = df.withColumn(
        "doc_id", F.when(F.col("doc_id") == 3, None).otherwise(F.col("doc_id"))
    )
    with pytest.raises(ValueError, match="NULL"):
        write_jsonl_shards(with_null, str(tmp_path / "x"), 2, "doc_id")
