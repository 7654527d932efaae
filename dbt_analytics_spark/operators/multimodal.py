"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so
the decode step is a clearly-marked deterministic fake behind the real Spark
plumbing — schema, partitioning, Arrow batch shape, and the mapInPandas UDF
signature are production-shaped; only the bytes→pixels step is stubbed.

Scale design: mapInPandas streams Arrow batches; per-batch work is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory stays
flat regardless of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the (stubbed) decode/feature-extract stage.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 4


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic fake for the decode → feature-extract step.

    A real deployment would decode the media (PIL/ffmpeg/torchaudio) and run
    a feature extractor here; those libs are unavailable in this container.
    The fake derives FEATURE_DIM floats from byte-slice checksums so tests
    have stable values and the Arrow plumbing is exercised end-to-end.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    step = max(len(payload) // FEATURE_DIM, 1)
    return [
        (sum(payload[i * step : (i + 1) * step or None]) % 997) / 997.0
        for i in range(FEATURE_DIM)
    ]


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

    NOTE: the decode is a deterministic STUB (see _fake_decode_features);
    everything Spark-side (Arrow batching, schema, partition preservation)
    is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(lambda b: sum(b) % (1 << 31)).astype("int64"),
                    "feature": payloads.map(_fake_decode_features),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


#: Output schema of the (stubbed) resize stage: payload out + new dims.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake for decode → resize → re-encode.

    A real deployment decodes with PIL/opencv and re-encodes; unavailable
    here. The fake tiles/truncates the byte stream to width*height bytes so
    output size is exactly what a (1-byte-per-pixel) resize would produce.
    """
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(
    binary_df: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize binary image payloads via mapInPandas (decode step STUBBED —
    see _fake_resize; Arrow batching, schema, and one-to-one row mapping are
    production-shaped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda b: _fake_resize(b, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            ).astype({"width": "int32", "height": "int32"})

    return binary_df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


#: Output schema of the (stubbed) video frame sampler: 1→N rows.
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

    The bytes→frame decode is a deterministic STUB (slices the payload into
    n_frames chunks standing in for decoded frames); a real deployment
    would seek/decode with ffmpeg here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
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
