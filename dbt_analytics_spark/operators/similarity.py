"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the scale path (candidates only meet within a hash bucket). Both use
higher-order functions (zip_with/aggregate) so the arithmetic runs JVM-side.

Scale design (100 TB): broadcast the (small) query set against the corpus —
the corpus never shuffles; top-k per query is a partial-aggregate-friendly
window. For corpus×corpus all-pairs, use the LSH variant: the random
hyperplane signatures bucket vectors so each bucket join is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import fan_out


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    The query side is broadcast; ranking windows partition by query id, so
    the shuffle key is the query id (high-cardinality, unskewed).
    """
    c = fan_out(corpus).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec")
    )
    pairs = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "corpus_id",
        cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a counter-based
    generator (no RNG state; reproducible across runs and engines)."""
    import hashlib
    import struct

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:{i}".encode()).digest()
        (u,) = struct.unpack(">Q", h[:8])
        vals.append((u / 2**64) * 2.0 - 1.0)
    return vals


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, then exact cosine
    within the bucket. ~2^num_planes buckets bound each join partition.

    Recall is approximate by design (the scale path); tests compare against
    the brute-force baseline for recall, not equality.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    def bucket_of(vec: Column) -> Column:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(v) for v in plane])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, plane in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = fan_out(corpus).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    ).withColumn("bucket", bucket_of(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec")
    ).withColumn("bucket", bucket_of(F.col("qvec")))

    pairs = c.join(F.broadcast(q), on="bucket").filter(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "corpus_id", cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )
