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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    their nearest of ``n_cells`` centroid cells; each query searches only its
    ``n_probe`` closest cells.

    Index build = one pass over the corpus against broadcast centroids (a
    driver-side list of n_cells vectors — bounded, not data-sized).
    Centroids are a deterministic hash-ordered sample of the corpus (a
    k-means iteration could refine them; sampling keeps the operator
    RNG-free and reproducible). The probe join key is the cell id, so each
    join partition is ~|corpus|/n_cells — the 100 TB scale path alongside
    the hyperplane-LSH variant.
    """
    c = fan_out(corpus).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    )
    # Deterministic centroid sample: first n_cells vectors in xxhash64 order.
    cent_rows = (
        c.orderBy(F.xxhash64(F.col("corpus_id")))
        .limit(n_cells)
        .select("cvec")
        .collect()
    )
    centroids = [list(r["cvec"]) for r in cent_rows]

    def cell_scores(vec: Column) -> Column:
        """array<struct<sim,cell>> of cosine vs every centroid."""
        return F.array(
            *[
                F.struct(
                    cosine(vec, F.array(*[F.lit(v) for v in cent])).alias("sim"),
                    F.lit(i).alias("cell"),
                )
                for i, cent in enumerate(centroids)
            ]
        )

    # array_max on struct orders by first field (sim) — nearest centroid.
    assigned = c.withColumn("scores", cell_scores(F.col("cvec"))).select(
        "corpus_id", "cvec", F.array_max("scores").getField("cell").alias("cell")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec")
    ).withColumn("scores", cell_scores(F.col("qvec")))
    # n_probe closest cells per query, exploded to (query, cell) probe rows.
    probes = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.slice(F.reverse(F.array_sort("scores")), 1, n_probe).getField("cell")
        ).alias("cell"),
    )

    pairs = assigned.join(F.broadcast(probes), on="cell").filter(
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
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH, then exact cosine within
    the bucket. Multi-table (`num_tables` independent plane sets): a pair
    collides if ANY table buckets them together — the standard
    recall/candidate-count dial (one table of p planes has collision
    probability (1-θ/π)^p, which is tiny for mid-range angles; OR-ing L
    tables lifts it to 1-(1-p_1)^L).

    Scale: candidates meet only on (table, bucket) join keys —
    ~|corpus|·L/2^p rows per bucket; the pair set is deduped before the
    exact rerank so each candidate is scored once.
    """
    tables = [
        [_hyperplane(dim, t * num_planes + p) for p in range(num_planes)]
        for t in range(num_tables)
    ]

    def buckets_of(vec: Column) -> Column:
        """array<struct<table,bucket>> — one bucket id per table."""
        entries = []
        for t, planes in enumerate(tables):
            bits = [
                F.when(
                    dot(vec, F.array(*[F.lit(v) for v in plane])) >= 0, F.lit(1 << i)
                ).otherwise(F.lit(0))
                for i, plane in enumerate(planes)
            ]
            code = bits[0]
            for b in bits[1:]:
                code = code + b
            entries.append(
                F.struct(F.lit(t).alias("table"), code.alias("bucket"))
            )
        return F.array(*entries)

    c = (
        fan_out(corpus)
        .select(F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec"))
        .select("corpus_id", "cvec", F.explode(buckets_of(F.col("cvec"))).alias("tb"))
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec"))
        .select("query_id", "qvec", F.explode(buckets_of(F.col("qvec"))).alias("tb"))
    )

    pairs = (
        c.join(F.broadcast(q), on="tb")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .drop("tb")
        .dropDuplicates(["query_id", "corpus_id"])
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
