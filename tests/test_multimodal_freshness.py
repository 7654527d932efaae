"""Multimodal plumbing (resize, frame sampling) and source-freshness tests."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.operators import multimodal
from dbt_analytics_spark.plans import check_freshness
from dbt_analytics_spark.sources import load_testdata

from .conftest import SF_DIR


@pytest.fixture()
def binary_docs(spark):
    docs = load_testdata(spark, SF_DIR)["documents"].limit(50)
    return multimodal.with_binary_payload(docs, "text")


def test_resize_shapes_and_determinism(spark, binary_docs):
    out = multimodal.resize_images(binary_docs, width=8, height=8)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["payload"]) == 64 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    again = {r["doc_id"]: bytes(r["payload"]) for r in multimodal.resize_images(binary_docs, 8, 8).collect()}
    assert {r["doc_id"]: bytes(r["payload"]) for r in rows} == again


def test_frame_sample_one_to_many(spark, binary_docs):
    frames = multimodal.sample_frames(binary_docs, n_frames=4, frame_interval_ms=500)
    agg = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("ts_offset_ms").alias("max_off"),
        F.sum(F.octet_length("frame")).alias("bytes_out"),
    )
    rows = agg.collect()
    assert len(rows) == 50
    assert all(r["n"] == 4 and r["max_off"] == 1500 for r in rows)
    # Frame slices cover ~the whole payload (chunking drops at most a tail
    # shorter than n_frames).
    sizes = {
        r["doc_id"]: r["n_bytes"]
        for r in binary_docs.select("doc_id", F.col("meta.n_bytes").alias("n_bytes")).collect()
    }
    for r in rows:
        assert sizes[r["doc_id"]] - r["bytes_out"] < 4


def test_freshness_thresholds(spark):
    ev = load_testdata(spark, SF_DIR)["events"]
    max_ts = ev.agg(F.max("ts")).collect()[0][0].replace(tzinfo=timezone.utc)

    fresh = check_freshness(
        ev, "ts", warn_after=timedelta(hours=1), error_after=timedelta(days=1),
        now=max_ts + timedelta(minutes=5),
    )
    assert fresh.status == "pass"
    warned = check_freshness(
        ev, "ts", warn_after=timedelta(hours=1), error_after=timedelta(days=30),
        now=max_ts + timedelta(hours=2),
    )
    assert warned.status == "warn"
    errored = check_freshness(
        ev, "ts", warn_after=timedelta(hours=1), error_after=timedelta(days=1),
        now=max_ts + timedelta(days=2),
    )
    assert errored.status == "error"
    empty = check_freshness(
        ev.filter(F.lit(False)), "ts", now=datetime.now(timezone.utc)
    )
    assert empty.status == "error"
