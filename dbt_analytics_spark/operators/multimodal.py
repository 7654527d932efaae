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
