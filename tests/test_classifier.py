"""Distributed logistic regression (operators/classifier.py): the
partial-gradient trainer's contracts — loss decreases, reruns reproduce
the weights, and the learned model actually separates the classes. The
pinned-weight scoring pass is hash-checked against DuckDB in the oracle
parity suite (txt16b)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_analytics_spark.operators.classifier import (
    N_FEATURES,
    logreg_fit,
    logreg_score,
)
from dbt_analytics_spark.sources import load_testdata

SF = "/root/testdata/sf0.001"


def test_loss_decreases_and_deterministic(spark):
    docs = load_testdata(spark, SF)["documents"]
    label = F.col("lang") == "en"
    w1, hist1 = logreg_fit(docs, label, max_iter=10)
    assert len(w1) == N_FEATURES
    # Full-batch GD with a sane lr on a bounded feature space: every
    # iteration must not increase the loss (monotone within float noise).
    assert all(b <= a + 1e-9 for a, b in zip(hist1, hist1[1:])), hist1
    assert hist1[-1] < hist1[0]
    w2, hist2 = logreg_fit(docs, label, max_iter=10)
    assert all(abs(a - b) < 1e-9 for a, b in zip(w1, w2))


def test_learned_model_separates_classes(spark):
    docs = load_testdata(spark, SF)["documents"]
    w, _ = logreg_fit(docs, F.col("lang") == "en", max_iter=25)
    scored = logreg_score(docs, w).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["is_en"]: r["m"]
        for r in scored.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("quality_score").alias("m"))
        .collect()
    }
    # The en class must score strictly higher on average than non-en.
    assert means[True] > means[False]


def test_score_bounds_and_schema(spark):
    docs = load_testdata(spark, SF)["documents"]
    out = logreg_score(docs, [0.0] * N_FEATURES)
    rows = out.collect()
    assert len(rows) == docs.count()
    # All-zero weights -> sigmoid(0) = 0.5 exactly, keep at threshold.
    assert all(r["quality_score"] == 0.5 and r["keep"] for r in rows)
