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


# ---------------------------------------------------------------------------
# BMP + WAV codecs (round 11): the two additional pure-numpy-decodable
# public formats. Round-trips are checked against independently-packed
# byte layouts, and the Spark operators against numpy-computed values.
# ---------------------------------------------------------------------------


def test_bmp_codec_roundtrip():
    rng = np.random.default_rng(7)
    # 5x3 exercises row padding (3*3=9 bytes -> padded to 12)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    payload = multimodal.encode_bmp(img)
    assert payload[:2] == b"BM"
    out = multimodal.decode_bmp(payload)
    assert out is not None and out.shape == (5, 3, 3)
    assert (out == img).all()
    # hand-packed golden: 1x1 red pixel, bottom-up BGR with 1-byte padding
    import struct as _s

    golden = (
        _s.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
        + _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
        + bytes([0, 0, 255, 0])  # BGR for red + pad byte
    )
    dec = multimodal.decode_bmp(golden)
    assert dec is not None and dec.shape == (1, 1, 3)
    assert dec[0, 0].tolist() == [255, 0, 0]
    # non-BMP / unsupported depth fall through to None
    assert multimodal.decode_bmp(b"BM tiny") is None
    assert multimodal.decode_bmp(b"not a bitmap at all......") is None


def test_extract_and_resize_bmp_payloads(spark):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, multimodal.encode_bmp(img))], "doc_id long, payload binary"
    )
    feats = multimodal.extract_features(df).collect()[0]
    expected = multimodal._pixel_features(img)
    assert feats["feature"] == pytest.approx(expected, abs=1e-6)
    resized = multimodal.resize_images(df, width=3, height=4).collect()[0]
    # codec preserved: BMP in -> BMP out, decodable, right dims
    out = multimodal.decode_bmp(bytes(resized["payload"]))
    assert out is not None and out.shape == (4, 3, 3)
    assert (out == multimodal._resize_pixels(img, 3, 4)).all()


def test_wav_codec_roundtrip_and_chunk_walk():
    t = np.arange(1600) / 16000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = multimodal.encode_wav(mono, sample_rate=16000, bits=16)
    decoded = multimodal.decode_wav(payload)
    assert decoded is not None
    samples, rate = decoded
    assert rate == 16000 and len(samples) == 1600
    assert samples == pytest.approx(mono, abs=2 / 32767)
    # stereo mono-mix: L = s, R = -s  =>  mix ~ 0
    stereo = np.stack([mono, -mono], axis=1)
    mixed, _ = multimodal.decode_wav(multimodal.encode_wav(stereo, 8000, 16))
    assert np.abs(mixed).max() <= 2 / 32767
    # an extra LIST chunk before fmt/data must be skipped (odd size -> pad)
    import struct as _s

    body = payload[12:]
    extra = _s.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
    wrapped = _s.pack("<4sI4s", b"RIFF", 4 + len(extra) + len(body), b"WAVE") + extra + body
    rewalked = multimodal.decode_wav(wrapped)
    assert rewalked is not None and len(rewalked[0]) == 1600
    # float32 WAV (audio_format=3)
    fmt = _s.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    data = mono[:100].astype("<f4").tobytes()
    f32 = (
        _s.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + _s.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + _s.pack("<4sI", b"data", len(data)) + data
    )
    fsamples, frate = multimodal.decode_wav(f32)
    assert frate == 8000
    assert fsamples == pytest.approx(mono[:100], abs=1e-6)
    assert multimodal.decode_wav(b"RIFFxxxxNOPE") is None


def test_audio_features_real_and_fake(spark):
    rate = 8000
    t = np.arange(rate) / rate  # exactly 1 s
    tone = 0.25 * np.sin(2 * np.pi * 100 * t)
    df = spark.createDataFrame(
        [
            (1, multimodal.encode_wav(tone, sample_rate=rate, bits=16)),
            (2, b"definitely not audio"),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in multimodal.audio_features(df).collect()}
    real = rows[1]
    assert real["decoded"] is True
    assert real["sample_rate"] == rate
    assert real["duration_s"] == pytest.approx(1.0)
    # RMS of a full-period sine = amplitude / sqrt(2)
    assert real["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)
    assert real["peak"] == pytest.approx(0.25, rel=1e-3)
    # 100 Hz over 1 s = 200 zero crossings across 7999 sample pairs
    assert real["zero_crossing_rate"] == pytest.approx(200 / (rate - 1), rel=0.02)
    fake = rows[2]
    assert fake["decoded"] is False and fake["sample_rate"] == 0


def test_video_features_real_stream(spark):
    # Two flat-gray frames (64, 128) then a fake payload: luma means are
    # 64/255 and 128/255, diff is 64/255, all computed from real pixels.
    f1 = multimodal.encode_ppm(np.full((4, 5, 3), 64, dtype=np.uint8))
    f2 = multimodal.encode_ppm(np.full((4, 5, 3), 128, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, f1 + f2), (2, b"no video here")], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in multimodal.video_features(df).collect()}
    real = rows[1]
    assert real["decoded"] is True and real["n_frames"] == 2
    assert real["mean_luma"] == pytest.approx((64 + 128) / 2 / 255.0, abs=1e-9)
    assert real["mean_frame_diff"] == pytest.approx(64 / 255.0, abs=1e-9)
    assert rows[2]["decoded"] is False and rows[2]["n_frames"] == 0


# ---------------------------------------------------------------------------
# Property: codec round-trips on arbitrary shapes/params (pure Python+numpy,
# no Spark job — cheap enough for many examples).
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    out = multimodal.decode_bmp(multimodal.encode_bmp(img))
    assert out is not None and (out == img).all()
    # BMP payloads must never be mistaken for PPM and vice versa
    assert multimodal.decode_ppm(multimodal.encode_bmp(img)) is None
    assert multimodal.decode_bmp(multimodal.encode_ppm(img)) is None


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    bits=st.sampled_from([16, 32]),
    channels=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, bits, channels, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1, 1, size=(n, channels))
    payload = multimodal.encode_wav(samples, sample_rate=rate, bits=bits)
    decoded = multimodal.decode_wav(payload)
    assert decoded is not None
    mono, got_rate = decoded
    assert got_rate == rate and len(mono) == n
    # quantization error bounded by 1 LSB of the int width
    tol = 2.0 / (2 ** (bits - 1) - 1)
    assert np.abs(mono - samples.mean(axis=1)).max() <= tol if n else True
