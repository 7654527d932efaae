"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode path is REAL for PPM (P6) images and PPM-stream "videos": a
pure-Python header parse + numpy over the pixel bytes runs inside the
mapInPandas UDFs (no external media libraries needed — the container has
none). Feature extraction, nearest-neighbor resize, and frame sampling all
operate on actual decoded pixels. Payloads that are not PPM (e.g. the
text-derived testdata bytes) fall back to a clearly-marked deterministic
fake, keeping the Arrow plumbing exercised for arbitrary media bytes whose
codecs (JPEG/PNG/mp4) would require PIL/ffmpeg.

Scale design: mapInPandas streams Arrow batches; per-batch work is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory stays
flat regardless of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# PPM (P6) codec — the binary image format writable/parsable in pure Python
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6) image."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got {arr.shape}")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a P6 header; returns (width, height, pixel_data_offset) or None
    if the payload is not a binary PPM."""
    if not payload.startswith(b"P6"):
        return None
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        try:
            fields.append(int(payload[start:pos]))
        except ValueError:
            return None
    if len(fields) < 3 or fields[2] != 255:
        return None
    pos += 1  # the single whitespace byte after maxval
    width, height = fields[0], fields[1]
    if width <= 0 or height <= 0 or pos + width * height * 3 > n:
        return None
    return width, height, pos


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Decode a binary PPM (P6) payload to an (h, w, 3) uint8 array, or None
    when the payload is not PPM (caller falls back to the fake path)."""
    header = _parse_ppm_header(payload)
    if header is None:
        return None
    width, height, offset = header
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=offset
    )
    return pixels.reshape(height, width, 3)


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-PPM "video" payload into its frames. Returns []
    when the payload is not a PPM stream."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        header = _parse_ppm_header(payload[pos:])
        if header is None:
            return []
        width, height, offset = header
        end = pos + offset + width * height * 3
        frames.append(payload[pos:end])
        pos = end
    return frames


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

#: Output schema of the decode/feature-extract stage.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 4


def _pixel_features(pixels: np.ndarray) -> list[float]:
    """Real pixel-derived features: per-channel means + luminance std, all
    normalized to [0, 1]."""
    channel_means = pixels.reshape(-1, 3).mean(axis=0) / 255.0
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return [*channel_means.tolist(), float(gray.std() / 255.0)]


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic FALLBACK for payloads whose codec is unavailable here
    (JPEG/PNG/audio/video would need PIL/ffmpeg): derives FEATURE_DIM floats
    from byte-slice checksums so arbitrary media bytes still flow through
    the same Arrow plumbing with stable values."""
    if not payload:
        return [0.0] * FEATURE_DIM
    step = max(len(payload) // FEATURE_DIM, 1)
    return [
        (sum(payload[i * step : (i + 1) * step or None]) % 997) / 997.0
        for i in range(FEATURE_DIM)
    ]


def _decode_features(payload: bytes) -> list[float]:
    pixels = decode_ppm(payload)
    if pixels is not None:
        return _pixel_features(pixels)
    return _fake_decode_features(payload)


def with_binary_payload(df: DataFrame, source_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload as binary + typed metadata struct.

    (Here the payload is utf-8 bytes of a text column — the testdata has no
    real media — but the schema is the production one.)
    """
    return df.select(
        "doc_id",
        F.encode(F.col(source_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(source_col)).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    PPM payloads are ACTUALLY decoded (header parse + numpy) into
    per-channel means + luminance std; other codecs fall back to the
    deterministic fake (see _fake_decode_features).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(lambda b: sum(b) % (1 << 31)).astype("int64"),
                    "feature": payloads.map(_decode_features),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------

#: Output schema of the resize stage: payload out + new dims.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _resize_pixels(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index gather (the standard
    sample-at-pixel-centers mapping)."""
    h_in, w_in = pixels.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h_in / height).astype(int), h_in - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w_in / width).astype(int), w_in - 1)
    return pixels[rows[:, None], cols[None, :]]


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """FALLBACK for non-PPM payloads: tiles/truncates the byte stream to
    width*height bytes so output size is what a 1-byte-per-pixel resize
    would produce."""
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    pixels = decode_ppm(payload)
    if pixels is not None:
        return encode_ppm(_resize_pixels(pixels, width, height))
    return _fake_resize(payload, width, height)


def resize_images(
    binary_df: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize binary image payloads via mapInPandas. PPM payloads get a real
    nearest-neighbor resize (decode → numpy gather → re-encode); other
    codecs fall back to byte tiling (_fake_resize)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda b: _resize_payload(b, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            ).astype({"width": "int32", "height": "int32"})

    return binary_df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling
# ---------------------------------------------------------------------------

#: Output schema of the video frame sampler: 1→N rows.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_offset_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, frame_interval_ms: int = 1000
) -> DataFrame:
    """Sample N frames per video payload — the one-to-many mapInPandas shape
    (each input row yields ``n_frames`` output rows).

    A concatenated-PPM stream is ACTUALLY demuxed: n_frames evenly-spaced
    frames are selected, each output frame is a valid standalone PPM, and
    ts_offset_ms reflects the source frame's position. Non-PPM payloads
    fall back to slicing the byte stream into n_frames chunks standing in
    for decoded frames (a real deployment would seek/decode with ffmpeg).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                src_frames = split_ppm_stream(payload)
                if src_frames:
                    # Evenly-spaced sample over the real decoded frames.
                    picks = np.linspace(0, len(src_frames) - 1, n_frames).round().astype(int)
                    for out_idx, src_idx in enumerate(picks):
                        ids.append(doc_id)
                        idxs.append(out_idx)
                        offs.append(int(src_idx) * frame_interval_ms)
                        frames.append(src_frames[int(src_idx)])
                else:
                    chunk = max(len(payload) // n_frames, 1) if payload else 1
                    for i in range(n_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        offs.append(i * frame_interval_ms)
                        frames.append(bytes(payload[i * chunk : (i + 1) * chunk]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_offset_ms": pd.Series(offs, dtype="int32"),
                    "frame": frames,
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
