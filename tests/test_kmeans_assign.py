"""Contracts for kmeans_assign / kmeans_cluster_stats
(operators/similarity.py): full coverage, determinism, the tie-break and
inertia relationships with kmeans_fit, and null-embedding handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.operators.similarity import (
    kmeans_assign,
    kmeans_cluster_stats,
    kmeans_fit,
)
from dbt_analytics_spark.sources import load_testdata

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_testdata(spark, SF_DIR)["embeddings"]


def test_assign_covers_every_vector_once(spark, emb):
    C, _ = kmeans_fit(emb, n_cells=8, max_iter=3)
    assigned = kmeans_assign(emb, C)
    n_vecs = emb.filter(F.col("embedding").isNotNull()).count()
    assert assigned.count() == n_vecs
    assert assigned.select("id").distinct().count() == n_vecs
    cells = [r.cell for r in assigned.select("cell").distinct().collect()]
    assert all(0 <= c < 8 for c in cells)


def test_assign_deterministic_and_matches_numpy(spark, emb):
    C, _ = kmeans_fit(emb, n_cells=4, max_iter=2)
    a1 = {r.id: (r.cell, r.dist2) for r in kmeans_assign(emb, C).collect()}
    a2 = {r.id: (r.cell, r.dist2) for r in kmeans_assign(emb, C).collect()}
    assert a1 == a2
    # Brute-force recompute a sample of assignments on the driver.
    rows = emb.filter(F.col("embedding").isNotNull()).limit(25).collect()
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        d2 = ((C - v) ** 2).sum(axis=1)
        assert a1[r.vec_id][0] == int(d2.argmin())
        assert a1[r.vec_id][1] == pytest.approx(float(d2.min()), rel=1e-12)


def test_assignment_inertia_not_above_fit_history(spark, emb):
    # history[-1] is the SSE under the PRE-update centroids; assigning with
    # the post-update centroids can only tighten it (Lloyd monotonicity).
    C, history = kmeans_fit(emb, n_cells=8, max_iter=4)
    assigned = kmeans_assign(emb, C)
    inertia = assigned.agg(F.sum("dist2")).collect()[0][0]
    assert inertia <= history[-1] * (1 + 1e-9)
    assert history == sorted(history, reverse=True)


def test_cluster_stats_sum_to_corpus(spark, emb):
    C, _ = kmeans_fit(emb, n_cells=8, max_iter=3)
    stats = kmeans_cluster_stats(kmeans_assign(emb, C))
    total = stats.agg(F.sum("n_vecs")).collect()[0][0]
    assert total == emb.filter(F.col("embedding").isNotNull()).count()


def test_assign_drops_null_embeddings_and_validates_shape(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    C = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = {r.id: r.cell for r in kmeans_assign(df, C).collect()}
    assert out == {1: 0, 3: 1}
    with pytest.raises(ValueError, match="2-D"):
        kmeans_assign(df, np.asarray([1.0, 0.0]))
