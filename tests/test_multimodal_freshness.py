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


def _extensible_wav(sub_format: int, data: bytes, bits: int, rate: int = 8000) -> bytes:
    """WAVE_FORMAT_EXTENSIBLE container: fmt tag 0xFFFE + 22-byte
    extension whose SubFormat GUID's first u16 carries the REAL format."""
    import struct as _s

    block = bits // 8
    guid = _s.pack("<H", sub_format) + b"\x00\x00" + bytes.fromhex(
        "0000100080000080" "00aa00389b71"
    )
    ext = _s.pack("<HI", bits, 0) + guid  # valid bits, channel mask, SubFormat
    fmt = _s.pack("<HHIIHH", 0xFFFE, 1, rate, rate * block, block, bits) + _s.pack("<H", 22) + ext
    return (
        _s.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + _s.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + _s.pack("<4sI", b"data", len(data)) + data
    )


def test_wav_extensible_subformat_guid_drives_decode():
    """0xFFFE WAVs must decode by the SubFormat GUID, not assumed PCM:
    an extensible IEEE-float32 payload reinterpreted as int32 yields
    garbage flagged decoded=True (the r11 bug)."""
    t = np.arange(200) / 8000.0
    mono = 0.25 * np.sin(2 * np.pi * 440 * t)
    # SubFormat = IEEE float (3), 32-bit payload
    f32 = _extensible_wav(3, mono.astype("<f4").tobytes(), 32)
    decoded = multimodal.decode_wav(f32)
    assert decoded is not None
    assert decoded[0] == pytest.approx(mono, abs=1e-6)
    # SubFormat = PCM (1), 16-bit payload
    pcm = _extensible_wav(1, (mono * 32767).astype("<i2").tobytes(), 16)
    decoded = multimodal.decode_wav(pcm)
    assert decoded is not None
    assert decoded[0] == pytest.approx(mono, abs=2 / 32767)
    # Unknown SubFormat (ALAW = 6) -> unsupported, None (fake path)
    assert multimodal.decode_wav(_extensible_wav(6, b"\x00" * 64, 16)) is None
    # Truncated extension (no GUID) -> None, never assumed PCM
    import struct as _s

    short_fmt = _s.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    trunc = (
        _s.pack("<4sI4s", b"RIFF", 4 + 8 + len(short_fmt) + 8 + 4, b"WAVE")
        + _s.pack("<4sI", b"fmt ", len(short_fmt)) + short_fmt
        + _s.pack("<4sI", b"data", 4) + b"\x00" * 4
    )
    assert multimodal.decode_wav(trunc) is None


def test_encode_wav_rejects_8_bit():
    """8-bit WAV is unsigned-centered; the signed scale would wrap
    negatives into loud positive samples. Reject loudly."""
    with pytest.raises(ValueError, match="16/32-bit"):
        multimodal.encode_wav(np.zeros(4), bits=8)
    with pytest.raises(ValueError, match="16/32-bit"):
        multimodal.encode_wav(np.zeros(4), bits=24)


# ---------------------------------------------------------------------------
# PNG codec (r12): stdlib zlib + numpy scanline unfiltering
# ---------------------------------------------------------------------------


def _manual_png(w, h, color, raw_rows, plte=None):
    """Hand-assemble a PNG with filter 0 rows for non-RGB color types the
    encoder doesn't write (gray/palette/gray-alpha/RGBA)."""
    import struct as _s
    import zlib as _z

    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + _s.pack(
            ">I", _z.crc32(tag + body) & 0xFFFFFFFF
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = b"".join(b"\x00" + r.tobytes() for r in raw_rows)
    body = _z.compress(scan)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte.tobytes())
    return out + chunk(b"IDAT", body) + chunk(b"IEND", b"")


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    filter_type=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, filter_type, seed):
    """Every scanline filter (None/Sub/Up/Average/Paeth) must round-trip
    bit-exactly through encode -> zlib -> unfilter."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = multimodal.encode_png(img, filter_type=filter_type)
    out = multimodal.decode_png(payload)
    assert out is not None and out.dtype == np.uint8
    assert (out == img).all()


def test_png_color_types_and_fallbacks():
    rng = np.random.default_rng(7)
    # grayscale (0) -> replicated to RGB
    g = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = multimodal.decode_png(_manual_png(9, 5, 0, list(g)))
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
    # RGBA (6) -> alpha dropped
    rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    out = multimodal.decode_png(_manual_png(6, 4, 6, [r.reshape(-1) for r in rgba]))
    assert (out == rgba[:, :, :3]).all()
    # gray+alpha (4) -> gray replicated
    ga = rng.integers(0, 256, size=(3, 5, 2), dtype=np.uint8)
    out = multimodal.decode_png(_manual_png(5, 3, 4, [r.reshape(-1) for r in ga]))
    assert (out == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    # palette (3) -> PLTE lookup
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 7), dtype=np.uint8)
    out = multimodal.decode_png(_manual_png(7, 6, 3, list(idx), plte=plte))
    assert (out == plte[idx]).all()
    # palette index out of range -> None (not a crash)
    bad_idx = np.full((2, 2), 200, dtype=np.uint8)
    assert multimodal.decode_png(_manual_png(2, 2, 3, list(bad_idx), plte=plte)) is None
    # interlaced / 16-bit / truncated -> None (fake path)
    import struct as _s
    import zlib as _z

    good = multimodal.encode_png(rng.integers(0, 256, (3, 3, 3), dtype=np.uint8))
    assert multimodal.decode_png(good[:40]) is None
    ihdr16 = _s.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)

    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + _s.pack(
            ">I", _z.crc32(tag + body) & 0xFFFFFFFF
        )

    p16 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(
        b"IDAT", _z.compress(b"\x00" * 57)
    ) + chunk(b"IEND", b"")
    assert multimodal.decode_png(p16) is None
    # corrupt zlib stream -> None
    bad = good.replace(b"IDAT", b"IDAT")  # locate idat, then flip bytes after
    i = bad.index(b"IDAT") + 4
    bad = bad[:i] + bytes([bad[i] ^ 0xFF]) + bad[i + 1 :]
    assert multimodal.decode_png(bad) is None
    # not a PNG at all
    assert multimodal.decode_png(b"hello world") is None
    assert multimodal.decode_ppm(good) is None and multimodal.decode_bmp(good) is None


def test_png_flows_through_image_pipeline(spark):
    """PNG payloads must ride the REAL decode path end-to-end: features
    from actual pixels, resize re-encoding PNG->PNG."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    payload = multimodal.encode_png(img, filter_type=4)
    pixels, codec = multimodal._decode_image(payload)
    assert codec == "png" and (pixels == img).all()
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    resized = multimodal.resize_images(df, width=6, height=5).collect()[0]
    out = multimodal.decode_png(bytes(resized["payload"]))
    assert out is not None and out.shape == (5, 6, 3)


# ---------------------------------------------------------------------------
# mm3/mm4 oracle-exactness preconditions (r12)
# ---------------------------------------------------------------------------


def test_luma_bit_matches_duckdb_for_all_byte_values():
    """_video_feature_row's elementwise luma must bit-match DuckDB's
    r*w0 + g*w1 + b*w2 for every possible uniform-gray byte — the MM4
    oracle's exactness precondition (a BLAS matmul would FMA and break
    this; exhaustive over the whole input domain)."""
    import duckdb

    np_l = (
        np.arange(256).astype(np.float64) * 0.299
        + np.arange(256).astype(np.float64) * 0.587
        + np.arange(256).astype(np.float64) * 0.114
    ) / 255.0
    # And via the actual operator path on uniform frames:
    op_l = []
    for v in range(256):
        payload = multimodal.encode_ppm(np.full((2, 2, 3), v, np.uint8))
        row = multimodal._video_feature_row(payload + payload)
        assert row[0] is True and row[1] == 2 and row[3] == 0.0
        op_l.append(row[2])
    con = duckdb.connect()
    dd = [
        r[0]
        for r in con.execute(
            "SELECT (v*0.299::DOUBLE + v*0.587::DOUBLE + v*0.114::DOUBLE)"
            "/255.0::DOUBLE FROM range(256) t(v) ORDER BY v"
        ).fetchall()
    ]
    assert all(dd[v] == np_l[v] == op_l[v] for v in range(256))


def test_wav_synth_quantization_matches_trunc_rule():
    """wav_from_bytes quantization must equal trunc((b-128)*32767/128)
    for every byte value — the MM3 oracle's sample rule (exhaustive)."""
    all_bytes = bytes(range(256))
    arr = (np.frombuffer(all_bytes, np.uint8).astype(np.float64) - 128.0) / 128.0
    payload = multimodal.encode_wav(arr, sample_rate=16000, bits=16)
    import struct as _s

    di = payload.index(b"data") + 8
    i16 = np.frombuffer(payload[di : di + 512], dtype="<i2")
    expect = np.trunc((np.arange(256) - 128) * 32767.0 / 128.0).astype(np.int64)
    assert (i16.astype(np.int64) == expect).all()
    # and the decode side divides by 2^15 exactly
    samples, rate = multimodal.decode_wav(payload)
    assert rate == 16000 and (samples == i16 / 32768.0).all()


def test_synth_operators_shapes(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a"), (3, "")],
        "doc_id long, text string",
    )
    wav = {r["doc_id"]: bytes(r["payload"]) for r in multimodal.wav_from_bytes(df).collect()}
    assert multimodal.decode_wav(wav[1])[0].shape == (11,)
    assert multimodal.decode_wav(wav[3])[0].shape == (0,)
    vid = {r["doc_id"]: bytes(r["payload"]) for r in multimodal.ppm_video_from_bytes(df).collect()}
    assert len(multimodal.split_ppm_stream(vid[1])) == 2
    assert vid[2] == b"" and vid[3] == b""  # sub-n_frames docs -> fake path


# ---------------------------------------------------------------------------
# JPEG codec (round 13): baseline sequential JFIF in pure numpy — Huffman
# + dequant + IDCT + YCbCr, 4:4:4 and 4:2:0, DRI/RSTn restarts. Lossy, so
# round-trip properties BOUND the reconstruction error instead of
# asserting equality; everything non-baseline must fall through to None.
# ---------------------------------------------------------------------------


def _smooth_image(h, w, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / max(w, 1), yy * 255 / max(h, 1),
         (xx + yy) * 255 / max(h + w, 1)],
        axis=-1,
    )
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype("uint8")


@given(
    h=st.integers(min_value=8, max_value=40),
    w=st.integers(min_value=8, max_value=40),
    quality=st.sampled_from([75, 90, 95]),
    subsample=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=12, deadline=None)
def test_jpeg_roundtrip_property(h, w, quality, subsample, seed):
    """Encode a smooth image, decode, bound reconstruction error — the
    same property pattern as BMP/PNG, with a lossy-codec bound. The
    shapes include non-multiples of 8 (edge-block padding both ways)."""
    import numpy as np

    img = _smooth_image(h, w, seed)
    dec = multimodal.decode_jpeg(
        multimodal.encode_jpeg(img, quality=quality, subsample=subsample)
    )
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth content at quality >= 75 reconstructs within a tight band
    assert err.mean() < 8, err.mean()
    assert err.max() < 64, err.max()


def test_jpeg_flat_image_is_exact():
    import numpy as np

    flat = np.full((24, 17, 3), 100, dtype=np.uint8)
    dec = multimodal.decode_jpeg(multimodal.encode_jpeg(flat, quality=95))
    assert dec is not None
    assert int(np.abs(dec.astype(int) - 100).max()) == 0


def test_jpeg_restart_markers_decode_identically():
    import numpy as np

    img = _smooth_image(40, 56, 11)
    for subsample in (False, True):
        base = multimodal.decode_jpeg(
            multimodal.encode_jpeg(img, subsample=subsample)
        )
        rst = multimodal.decode_jpeg(
            multimodal.encode_jpeg(
                img, subsample=subsample, restart_interval=2
            )
        )
        # RSTn segmentation + predictor resets change the BITSTREAM, not
        # the decoded pixels
        assert np.array_equal(base, rst)


def test_jpeg_non_baseline_falls_through():
    img = _smooth_image(16, 16, 3)
    enc = bytearray(multimodal.encode_jpeg(img))
    idx = bytes(enc).find(b"\xff\xc0")
    for sof in (0xC1, 0xC2, 0xCA):  # extended / progressive / arithmetic
        enc[idx + 1] = sof
        assert multimodal.decode_jpeg(bytes(enc)) is None
    assert multimodal.decode_jpeg(b"not a jpeg") is None
    assert multimodal.decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert multimodal.decode_jpeg(bytes(enc)[:40]) is None  # truncated


def test_jpeg_flows_through_image_pipeline(spark):
    """extract_features and resize must treat JPEG payloads as REAL
    decodes (decoded=true, features from actual pixels, resize
    re-encoding in-codec) — the same plumbing contract as PPM/BMP/PNG."""
    import numpy as np

    import numpy as np

    imgs = {i: _smooth_image(24, 24, i) for i in range(1, 4)}
    payloads = {i: multimodal.encode_jpeg(px, quality=95) for i, px in imgs.items()}
    df = spark.createDataFrame(sorted(payloads.items()), multimodal.SYNTH_SCHEMA)
    feats = {r["doc_id"]: list(r["feature"])
             for r in multimodal.extract_features(df).collect()}
    for i, payload in payloads.items():
        dec = multimodal.decode_jpeg(payload)
        expected = multimodal._pixel_features(dec)
        fake = multimodal._fake_decode_features(payload)
        got = feats[i]
        assert np.allclose(got, np.asarray(expected, dtype=np.float32)), i
        assert not np.allclose(got, np.asarray(fake, dtype=np.float32)), (
            "JPEG payload took the fake path"
        )
    resized = {r["doc_id"]: bytes(r["payload"])
               for r in multimodal.resize_images(df, 8, 8).collect()}
    for i in imgs:
        out = multimodal.decode_jpeg(resized[i])  # re-encoded as JPEG
        assert out is not None and out.shape == (8, 8, 3)


@given(
    h=st.integers(min_value=8, max_value=40),
    w=st.integers(min_value=8, max_value=40),
    quality=st.sampled_from([75, 90, 95]),
    subsample=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_matches_baseline_bit_for_bit(
    h, w, quality, subsample, seed
):
    """Progressive encode->decode must reproduce the BASELINE pipeline's
    pixels exactly: both paths share the forward transform and quant
    tables, so the coefficients are identical and only the entropy
    layers differ — any mistake in the EOBn / successive-approximation
    machinery breaks pixel equality. Shapes include non-multiples of 8
    (non-interleaved edge grids differ from the MCU grid)."""
    import numpy as np

    img = _smooth_image(h, w, seed)
    base = multimodal.decode_jpeg(
        multimodal.encode_jpeg(img, quality=quality, subsample=subsample)
    )
    prog = multimodal.decode_jpeg(
        multimodal.encode_jpeg_progressive(
            img, quality=quality, subsample=subsample
        )
    )
    assert prog is not None
    assert np.array_equal(prog, base)


def test_jpeg_progressive_is_sof2_and_multiscan():
    enc = multimodal.encode_jpeg_progressive(_smooth_image(24, 24, 5))
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == 10  # the full scan script


def test_jpeg_progressive_ac_first_eobn_hand_vector():
    """Independent spec vector for the EOBn decode path (not a
    round-trip): a 2-block single-component AC-first scan where block 1
    ends with EOB2 declaring a 2-block end-of-band run covering block 2.
    Huffman table: the flat progressive AC table (symbol s at length 8
    for s < 128: code == symbol)."""
    import numpy as np

    from dbt_analytics_spark.operators.multimodal import (
        _PROG_AC_HUFF,
        _BitReader,
        _huff_decode_lut,
        _prog_scan,
    )

    lut = _huff_decode_lut(*_PROG_AC_HUFF)
    # block 1: (run=0,size=1) coef=+1 at k=1, then EOB2: symbol 0x10
    # (r=1 -> eobrun = 2^1-1 + ext(1)), ext bit = 1 -> eobrun = 2
    # covering THIS block's remainder plus block 2 entirely.
    bits = ""
    bits += format(0x01, "08b") + "1"  # symbol (0,1), value bit 1 -> +1
    bits += format(0x10, "08b") + "1"  # EOB2 with extension bit 1
    payload = int(bits + "0" * (8 - len(bits) % 8), 2).to_bytes(
        (len(bits) + 7) // 8, "big"
    )
    frame = (8, 16, [(1, 1, 1, 0)])  # 8x16 gray: two 8x8 blocks
    dims = (1, 1, 2, 1)
    coeffs = [np.zeros((1, 2, 64), dtype=np.int32)]
    huff = {("ac", 0): lut}
    _prog_scan(
        payload, 0, frame, dims, [(0, 0, 0)], 1, 63, 0, 0,
        huff, 0, coeffs,
    )
    assert coeffs[0][0, 0, 1] == 1  # the decoded +1
    assert not coeffs[0][0, 0, 2:].any()  # rest of block 1: EOB
    assert not coeffs[0][0, 1].any()  # block 2 consumed by the EOB run


def test_jpeg_progressive_ac_refine_hand_vector():
    """Independent spec vector for the refinement correction-bit path:
    one block holding an already-nonzero +2 at k=1 (history 2 at Al=1 ->
    value 4 at Al=0... stored as 4 here) receives a correction bit and a
    newly-nonzero -1 at k=3."""
    import numpy as np

    from dbt_analytics_spark.operators.multimodal import (
        _PROG_AC_HUFF,
        _huff_decode_lut,
        _prog_scan,
    )

    lut = _huff_decode_lut(*_PROG_AC_HUFF)
    # stored state after the first scan (Al=1): coef[1] = 4 (i.e. 2<<1)
    coeffs = [np.zeros((1, 1, 64), dtype=np.int32)]
    coeffs[0][0, 0, 1] = 4
    # refinement at Al=0: symbol (r=1, s=1) -> skip one zero-history
    # coefficient (k=2), placing the new coef at k=3; sign bit 0 -> -1;
    # while advancing, the old-nonzero at k=1 consumes a correction bit
    # FIRST (it precedes the skipped zero): bit=1 -> 4 -> 5.
    bits = format(0x11, "08b") + "0" + "1" + "0"
    # ^ symbol  ^sign(-)  ^corr k=1  ^zero-run bit? none: last 0 = pad
    payload = int(bits + "0" * ((8 - len(bits) % 8) % 8), 2).to_bytes(
        (len(bits) + 7) // 8, "big"
    )
    frame = (8, 8, [(1, 1, 1, 0)])
    dims = (1, 1, 1, 1)
    huff = {("ac", 0): lut}
    _prog_scan(
        payload, 0, frame, dims, [(0, 0, 0)], 1, 63, 1, 0,
        huff, 0, coeffs,
    )
    blk = coeffs[0][0, 0]
    assert blk[1] == 5  # correction bit applied toward larger magnitude
    assert blk[2] == 0  # the skipped zero-history position
    assert blk[3] == -1  # newly nonzero, sign bit 0 -> -(1<<Al)


def test_jpeg_progressive_adversarial_content_bit_for_bit():
    """Pure noise (dense AC spectra -> every ZRL/EOBn shape),
    checkerboards (max high-frequency energy), and flats (pure EOB
    runs), across qualities and both subsampling modes — progressive
    must equal baseline exactly on all of them."""
    import numpy as np

    rng = np.random.default_rng(7)
    for trial in range(6):
        h, w = (int(x) for x in rng.integers(8, 81, 2))
        kind = trial % 3
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            g = (np.indices((h, w)).sum(0) % 2 * 255).astype(np.uint8)
            img = np.stack([g, g, g], -1)
        else:
            img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        for q in (30, 90):
            for sub in (False, True):
                base = multimodal.decode_jpeg(
                    multimodal.encode_jpeg(img, quality=q, subsample=sub)
                )
                prog = multimodal.decode_jpeg(
                    multimodal.encode_jpeg_progressive(
                        img, quality=q, subsample=sub
                    )
                )
                assert prog is not None and np.array_equal(prog, base), (
                    h, w, q, sub, kind,
                )


def _box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body) + 8) + btype + body


def _minimal_mp4(timescale=1000, duration=7500) -> bytes:
    """Hand-built ISO-BMFF: ftyp + moov{mvhd, trak{mdia{hdlr,
    minf{stbl{stsd(avc1), stsz(n=120)}}}}} — public 14496-12 grammar."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        bytes(1) + bytes(3)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + bytes(80),  # rate/volume/matrix/next_track (unused here)
    )
    hdlr = _box(
        b"hdlr", bytes(4) + bytes(4) + b"vide" + bytes(12) + b"h\x00"
    )
    avc1 = _box(b"avc1", bytes(70))
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + avc1)
    stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 0, 120))
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def _minimal_mp3(n_frames=5, with_id3=False) -> bytes:
    """Hand-built MPEG-1 Layer III CBR frames: 128 kbps, 44100 Hz,
    no padding -> frame length 144*128000/44100 = 417 bytes."""
    import struct

    # sync=0x7FF, ver=3 (MPEG1), layer=1 (III), no-crc=1, bitrate idx 9
    # (128k), samplerate idx 0 (44100), pad 0
    header = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (9 << 12) | (0 << 10)
    frame = struct.pack(">I", header) + bytes(417 - 4)
    out = frame * n_frames
    if with_id3:
        tag_body = bytes(20)
        out = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, len(tag_body)]) \
            + tag_body + out
    return out


def test_mp4_metadata_real_container_parse():
    m = multimodal.mp4_metadata(_minimal_mp4())
    assert m is not None
    assert m["duration_s"] == 7.5
    assert len(m["tracks"]) == 1
    t = m["tracks"][0]
    assert t["handler"] == "vide"
    assert t["codec"] == "avc1"
    assert t["samples"] == 120
    # non-mp4 payloads refuse
    assert multimodal.mp4_metadata(b"\x00" * 64) is None
    assert multimodal.mp4_metadata(_minimal_mp3()) is None
    # truncated moov: clean None (no exception, no partial duration)
    assert multimodal.mp4_metadata(_minimal_mp4()[:24]) is None


def test_mp3_metadata_real_frame_walk():
    m = multimodal.mp3_metadata(_minimal_mp3(n_frames=5))
    assert m is not None
    assert m["frames"] == 5
    assert m["samples"] == 5 * 1152
    assert m["sample_rate"] == 44100
    assert abs(m["duration_s"] - 5 * 1152 / 44100) < 1e-9
    # ID3v2 tag skipped
    m2 = multimodal.mp3_metadata(_minimal_mp3(n_frames=3, with_id3=True))
    assert m2 is not None and m2["frames"] == 3
    # a single accidental sync word is NOT an mp3 (needs 2+ frames)
    assert multimodal.mp3_metadata(_minimal_mp3(n_frames=1)) is None
    assert multimodal.mp3_metadata(b"\xff\xfb" + bytes(100)) is None
    assert multimodal.mp3_metadata(_minimal_mp4()) is None


def test_malformed_containers_never_raise():
    """ADVICE r14: a truncated mvhd whose declared box size fits the
    payload but whose BODY is shorter than the version's field layout
    must return None, not propagate struct.error out of the
    mapInPandas UDF (one bad payload must never kill a curation pass)."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    # 12-byte mvhd box: size/type + 4 body bytes — end-body==4, but v0
    # needs 20 body bytes. Pre-guard this raised struct.error.
    bad_mvhd = struct.pack(">I", 12) + b"mvhd" + bytes(4)
    assert multimodal.mp4_metadata(ftyp + bad_mvhd) is None
    # same, version 1 (needs 32 body bytes)
    bad_mvhd_v1 = struct.pack(">I", 13) + b"mvhd" + bytes([1]) + bytes(4)
    assert multimodal.mp4_metadata(ftyp + bad_mvhd_v1) is None
    # truncated-at-every-byte fuzz over a real container: None or a
    # parse, never an exception
    full = _minimal_mp4()
    for cut in range(len(full)):
        multimodal.mp4_metadata(full[:cut])
    full3 = _minimal_mp3(n_frames=3, with_id3=True)
    for cut in range(len(full3)):
        multimodal.mp3_metadata(full3[:cut])
    # bit-flip fuzz (deterministic positions): never an exception
    for pos in range(0, len(full), 7):
        mut = bytearray(full)
        mut[pos] ^= 0xFF
        multimodal.mp4_metadata(bytes(mut))
    for pos in range(0, len(full3), 7):
        mut = bytearray(full3)
        mut[pos] ^= 0xFF
        multimodal.mp3_metadata(bytes(mut))


def test_media_stub_encoders_roundtrip():
    """encode_mp4_stub / encode_mp3_cbr_stub (the mm5 corpus builders)
    round-trip exactly through the real container parsers."""
    m = multimodal.mp4_metadata(multimodal.encode_mp4_stub(1000, 7500))
    assert m is not None and m["duration_s"] == 7.5
    assert m["tracks"][0]["codec"] == "avc1"
    m3 = multimodal.mp3_metadata(multimodal.encode_mp3_cbr_stub(4))
    assert m3 is not None and m3["frames"] == 4
    assert m3["samples"] == 4 * 1152 and m3["sample_rate"] == 44100


def test_media_metadata_operator_classifies_all(spark):
    import numpy as np

    img = _smooth_image(16, 16, 2)
    rows = [
        ("mp4", bytearray(_minimal_mp4())),
        ("mp3", bytearray(_minimal_mp3())),
        ("jpeg", bytearray(multimodal.encode_jpeg(img))),
        ("jpeg_prog", bytearray(multimodal.encode_jpeg_progressive(img))),
        ("wav", bytearray(
            multimodal.encode_wav(np.zeros(8000), sample_rate=8000)
        )),
        ("junk", bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    got = {
        r["doc_id"]: (r["media_type"], r["duration_s"], r["n_units"])
        for r in multimodal.media_metadata(df).collect()
    }
    assert got["mp4"] == ("mp4", 7.5, 1)
    assert got["mp3"][0] == "mp3" and got["mp3"][2] == 5
    assert got["jpeg"] == ("jpeg", 0.0, 1)
    assert got["jpeg_prog"] == ("jpeg", 0.0, 1)
    assert got["wav"] == ("wav", 1.0, 8000)
    assert got["junk"][0] == "unknown"


def test_media_corpus_generic_over_id_type(spark):
    """ADVICE r15: media_corpus_from_docs hardcoded ``doc_id long`` and
    ``int(doc_id) % 2`` while media_metadata had just been made generic
    over the id type — a string-keyed corpus either failed the Arrow
    conversion or raised inside the UDF. The builder now derives the
    output id type from the input schema and computes parity Spark-side
    (value parity for numeric ids, xxhash64 parity for the rest)."""
    str_docs = spark.createDataFrame(
        [("doc-a", "hello world"), ("doc-b", "tiny"), ("doc-c", "x" * 40)],
        "doc_id string, text string",
    )
    corpus = multimodal.media_corpus_from_docs(str_docs)
    assert corpus.schema["doc_id"].dataType.simpleString() == "string"
    meta = {
        r["doc_id"]: r["media_type"]
        for r in multimodal.media_metadata(corpus).collect()
    }
    assert set(meta) == {"doc-a", "doc-b", "doc-c"}
    assert set(meta.values()) <= {"mp4", "mp3"}

    # numeric ids keep the oracle-able value-parity contract exactly
    num_docs = spark.createDataFrame(
        [(0, "even doc"), (1, "odd doc")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["media_type"]
        for r in multimodal.media_metadata(
            multimodal.media_corpus_from_docs(num_docs)
        ).collect()
    }
    assert got == {0: "mp4", 1: "mp3"}
