#!/usr/bin/env python
"""Dedup-realistic synthetic corpus at probe scale, generated IN SPARK.

The sf1/sf10 key-offset datasets replicate document text (plus a suffix),
so near-dup operators on them measure clone-pair volume, not throughput
(BENCH_NOTES round-7). This builder makes a corpus with genuinely
distinct texts and a CONTROLLED duplicate structure, so dd1/dd3/dd4/dd10
measure real work at scale:

  id % 20 == 0,1   -> exact duplicates   (2 copies share content)  10%
  id % 20 == 2     -> near duplicate of the group base (one word
                      substituted mid-document)                     5%
  otherwise        -> unique content                                85%

Content is fully deterministic (xxhash64 of (content_id, position) over a
50k-token vocabulary; no RNG), document length 50 + content_id % 150
words, generated DISTRIBUTED — the driver never materializes a row. This
is itself the 100 TB generation shape: `spark.range` -> expression-only
map -> parquet.

Usage: python scripts/build_dedup_corpus.py [n_docs] [out_dir]
Default 500k docs -> .scratch/dedup500k/documents.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scratch/dedup{N // 1000}k"
VOCAB = 50_000
LANGS = ["en", "de", "fr", "es"]


def main() -> None:
    spark = get_spark("dedup-corpus")
    ids = spark.range(0, N, 1, 64)
    base = F.col("id") - F.col("id") % 20
    content_id = (
        F.when(F.col("id") % 20 <= 2, base).otherwise(F.col("id")).alias("content_id")
    )
    df = ids.select("id", content_id)
    n_words = (F.lit(50) + F.col("content_id") % 150).cast("int")
    word = lambda pos: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.concat_ws("_", F.col("content_id").cast("string"), pos.cast("string"))),
            F.lit(VOCAB),
        ),
    )
    words = F.transform(F.sequence(F.lit(1), n_words), lambda i: word(i))
    # near-dup rows: substitute the 5th word so Jaccard stays ~ (L-1)/(L+1)
    words = F.when(
        F.col("id") % 20 == 2,
        F.concat(
            F.slice(words, 1, 4), F.array(F.lit("zzsub")), F.slice(words, 6, 100000)
        ),
    ).otherwise(words)
    text = F.concat_ws(" ", words)
    docs = df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]), (F.col("id") % 4 + 1).cast("int")
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 8).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    os.makedirs(OUT, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(OUT, "documents.parquet"))
    print(f"wrote {N} docs -> {OUT}/documents.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
