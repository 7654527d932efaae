"""Bit-identity pins for the Arrow-vectorized shingle stage (r16).

The dd3 optimization replaces the interpreted-HOF shingle build with a
numpy XXH64 over byte windows of the normalized text. These tests pin:

1. the vectorized XXH64 against Spark's ``xxhash64`` for every tail
   class (lengths 0-200 cover 0-6 stripes x word/4-byte/byte tails) and
   multibyte UTF-8;
2. the full Arrow shingle path against the expression path
   (``shingles_hashed``) as per-doc SETS over testdata plus adversarial
   edge docs, for several k;
3. dd3's pair OUTPUT with ``shingle_mode='arrow'`` vs ``'expr'`` —
   byte-identical rows, so the auto size gate can never change what the
   query computes.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.operators import dedup
from dbt_analytics_spark.operators.shingle_arrow import (
    shingles_hashed_arrow,
    xxh64_windows,
)

EDGE_DOCS = [
    (9000001, ""),
    (9000002, " "),
    (9000003, "\t"),
    (9000004, "\x0b\f\r\n"),
    (9000005, "one"),
    (9000006, "one two"),
    (9000007, "one two three"),
    (9000008, "one two three four five six"),
    (9000009, "  padded   text  "),
    (9000010, "a\xa0b c d"),  # NBSP is NOT Java \s — stays inside a token
    (9000011, "dup dup dup dup dup dup"),  # distinct shingles collapse
    (9000012, "ünïcode tökens höre wörds möre"),
    (9000013, "x " * 200),
    (9000014, None),
    (9000015, "averylongsingletokenwithoutanyspaces" * 20),  # >32B windows
    (9000016, "日本語 テキスト の 処理 を 検証 する"),
]


def test_xxh64_matches_spark(spark):
    random.seed(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 ,.!?"
    cases = [""]
    for length in range(1, 201):
        cases.append("".join(random.choice(alphabet) for _ in range(length)))
    cases += ["héllo wörld", "日本語のテキスト", "emoji 🎉 test", "ñ" * 40, "€" * 7]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    expected = [r[0] for r in df.select(F.xxhash64("s")).collect()]

    encoded = [c.encode("utf-8") for c in cases]
    buf = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    starts = np.zeros(len(encoded), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    got = xxh64_windows(buf, starts, lens)
    assert [int(g) for g in got] == expected


@pytest.mark.parametrize("k", [2, 3, 5])
def test_arrow_shingles_match_expression_path(spark, sf_dir, k):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
        )
    )
    expr = docs.select(
        F.col("doc_id").alias("doc"),
        F.sort_array(dedup.shingles_hashed("text", k)).alias("sh"),
    )
    arrow = shingles_hashed_arrow(docs, "doc_id", "text", k).select(
        "doc", F.sort_array("sh").alias("sh")
    )
    assert expr.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(expr).count() == 0
    assert expr.count() == arrow.count()


def test_dd3_pairs_identical_across_shingle_modes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kwargs = dict(
        id_col="doc_id", text_col="text", shingle_k=3, num_hashes=32,
        bands=8, threshold=0.5,
    )
    expr_pairs = dedup.minhash_lsh_pairs(
        docs, shingle_mode="expr", **kwargs
    )
    arrow_pairs = dedup.minhash_lsh_pairs(
        docs, shingle_mode="arrow", **kwargs
    )
    assert expr_pairs.exceptAll(arrow_pairs).count() == 0
    assert arrow_pairs.exceptAll(expr_pairs).count() == 0
    assert expr_pairs.count() == arrow_pairs.count()
    dedup.release_shingle_indexes()


def test_string_id_corpus(spark):
    """The arrow path is generic over the id column type."""
    docs = spark.createDataFrame(
        [(f"id-{i}", f"alpha beta gamma delta {i}") for i in range(20)],
        "doc_id string, text string",
    )
    expr = docs.select(
        F.col("doc_id").alias("doc"),
        F.sort_array(dedup.shingles_hashed("text", 3)).alias("sh"),
    )
    arrow = shingles_hashed_arrow(docs, "doc_id", "text", 3).select(
        "doc", F.sort_array("sh").alias("sh")
    )
    assert expr.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(expr).count() == 0
