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


def test_oracle_fallback_assumption_no_ppm_payloads(spark):
    """MM1/MM2's DuckDB oracles replay only the non-PPM fallback arm of the
    decoder (queries/llm.py MM1_SQL/MM2_SQL); that is sound only while no
    testdata payload is a valid P6 PPM stream. The driver regenerates
    /root/testdata between rounds — fail loudly here if the assumption ever
    breaks instead of letting the oracle silently diverge."""
    docs = load_testdata(spark, SF_DIR)["documents"]
    binary = multimodal.with_binary_payload(docs, "text")
    n_ppm = binary.filter(
        F.substring(F.col("payload").cast("string"), 1, 2) == "P6"
    ).count()
    assert n_ppm == 0, (
        f"{n_ppm} document payloads start with 'P6' — MM1/MM2 oracle SQL "
        "no longer matches the Spark decode path; update the oracles."
    )


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


# ---------------------------------------------------------------------------
# Real PPM decode path: features/resize/frame-sample on actual pixels
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402


def _gradient_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_codec_roundtrip():
    img = _gradient_image(5, 7, seed=3)
    payload = multimodal.encode_ppm(img)
    back = multimodal.decode_ppm(payload)
    assert back is not None and np.array_equal(back, img)
    # Non-PPM bytes refuse to decode (fallback trigger).
    assert multimodal.decode_ppm(b"not an image") is None
    assert multimodal.decode_ppm(b"P6\n3 3\n255\nshort") is None  # truncated


def test_extract_features_real_pixels(spark):
    imgs = {1: _gradient_image(6, 6, seed=1), 2: _gradient_image(4, 8, seed=2)}
    df = spark.createDataFrame(
        [(k, multimodal.encode_ppm(v)) for k, v in imgs.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["feature"] for r in multimodal.extract_features(df).collect()}
    for k, img in imgs.items():
        means = img.reshape(-1, 3).mean(axis=0) / 255.0
        gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        expect = [*means, gray.std() / 255.0]
        assert np.allclose(got[k], expect, atol=1e-6), (k, got[k], expect)
    # Non-image payloads still flow through the fallback.
    txt = spark.createDataFrame([(9, b"just text bytes")], "doc_id long, payload binary")
    fb = multimodal.extract_features(txt).collect()[0]
    assert len(fb["feature"]) == multimodal.FEATURE_DIM


def test_resize_real_pixels_nearest_neighbor(spark):
    img = _gradient_image(4, 4, seed=5)
    df = spark.createDataFrame([(1, multimodal.encode_ppm(img))], "doc_id long, payload binary")
    out = multimodal.resize_images(df, width=2, height=2).collect()[0]
    decoded = multimodal.decode_ppm(bytes(out["payload"]))
    assert decoded is not None and decoded.shape == (2, 2, 3)
    # Nearest-neighbor at pixel centers: rows/cols [1, 3] of the 4x4 source.
    expect = img[np.ix_([1, 3], [1, 3])]
    assert np.array_equal(decoded, expect)
    # Upscale also exact: every output pixel is a source pixel.
    up = multimodal.resize_images(df, width=8, height=8).collect()[0]
    up_px = multimodal.decode_ppm(bytes(up["payload"]))
    rows = np.minimum(((np.arange(8) + 0.5) * 4 / 8).astype(int), 3)
    assert np.array_equal(up_px, img[np.ix_(rows, rows)])


def test_sample_frames_real_ppm_stream(spark):
    src = [_gradient_image(2, 2, seed=i) for i in range(6)]
    video = b"".join(multimodal.encode_ppm(f) for f in src)
    df = spark.createDataFrame([(1, video)], "doc_id long, payload binary")
    rows = sorted(
        multimodal.sample_frames(df, n_frames=4, frame_interval_ms=1000).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    # linspace(0, 5, 4).round() → source frames [0, 2, 3, 5].
    assert [r["ts_offset_ms"] for r in rows] == [0, 2000, 3000, 5000]
    for r, src_idx in zip(rows, [0, 2, 3, 5]):
        frame_px = multimodal.decode_ppm(bytes(r["frame"]))
        assert frame_px is not None and np.array_equal(frame_px, src[src_idx])
