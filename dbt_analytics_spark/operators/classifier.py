"""Distributed logistic-regression document classifier.

The learned counterpart to the Naive Bayes curation classifier
(operators/text.py:nb_classify): a linear model over cheap engine-side
document features, trained by full-batch gradient descent where each
iteration is ONE ``mapInPandas`` pass emitting per-batch partial
gradients — the kmeans_fit shape (model on the driver, rides in the task
closure; data never shuffles; driver memory = model size). This is the
canonical scalable GLM trainer: pass count = iterations, shuffle bytes
≈ 0, so at 100 TB each epoch costs exactly one corpus scan.

Everything is RNG-free: zero init, fixed learning rate and iteration
count, float64 partials — rerunning on the same corpus reproduces the
same weights bit-for-bit up to partition-order float addition, which the
tests pin at 1e-9.

Scoring with PINNED weights is a pure row-local expression (dot + sigmoid),
so the scoring pass is SQL-expressible and hash-checked against a DuckDB
oracle (queries/llm.py:txt16b) under the rounded-score convention —
the same exact-regime pattern as f5b/sim5b.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import fan_out


def quality_features(text_col: str = "text") -> list[Column]:
    """Cheap, engine-portable document features (bias excluded):
    log10(length+1), tokens/100, mean token length, digit ratio. All are
    int-derived arithmetic on the raw string — identical expressions
    exist in ANSI SQL, which is what keeps the scoring oracle exact."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    # tokens() convention elsewhere splits on whitespace; stay consistent.
    n_tokens = F.size(F.split(F.trim(c), r"\s+")).cast("double")
    n_digits = n_chars - F.length(F.regexp_replace(c, r"[0-9]", "")).cast(
        "double"
    )
    return [
        F.log10(n_chars + F.lit(1.0)),
        n_tokens / F.lit(100.0),
        n_chars / F.greatest(n_tokens, F.lit(1.0)) / F.lit(10.0),
        n_digits / F.greatest(n_chars, F.lit(1.0)),
    ]


#: Number of features INCLUDING the bias term.
N_FEATURES = 5


def _featurize(docs: DataFrame, text_col: str, label_col: Column | None) -> DataFrame:
    cols = [F.lit(1.0)] + quality_features(text_col)
    out = docs.select(
        F.array(*cols).alias("x"),
        *( [label_col.cast("double").alias("y")] if label_col is not None else [] ),
    )
    return out


def logreg_fit(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    lr: float = 0.5,
    max_iter: int = 30,
) -> tuple[list[float], list[float]]:
    """Train logistic regression by full-batch GD. Returns (weights,
    per-iteration mean-log-loss history). ``label`` is any boolean/0-1
    column expression over ``docs``."""
    import numpy as np

    data = fan_out(_featurize(docs, text_col, label)).persist()
    n_total = data.count()  # also materializes the persist
    w = np.zeros(N_FEATURES, dtype=np.float64)
    history: list[float] = []
    try:
        for _ in range(max_iter):
            w_c = w.copy()

            def partials(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in pdf["x"]]
                    )
                    y = pdf["y"].to_numpy(dtype=np.float64)
                    z = X @ w_c
                    p = 1.0 / (1.0 + np.exp(-z))
                    eps = 1e-12
                    loss = -(
                        y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps)
                    ).sum()
                    g = X.T @ (p - y)
                    yield pd.DataFrame(
                        {
                            "i": np.arange(N_FEATURES, dtype="int32"),
                            "g": g,
                            "loss": [float(loss)] + [0.0] * (N_FEATURES - 1),
                        }
                    )

            rows = data.mapInPandas(partials, "i int, g double, loss double").collect()
            grad = np.zeros(N_FEATURES, dtype=np.float64)
            loss = 0.0
            for r in rows:
                grad[r["i"]] += r["g"]
                loss += r["loss"]
            history.append(float(loss / max(n_total, 1)))
            w = w - lr * grad / max(n_total, 1)
    finally:
        data.unpersist()
    return [float(v) for v in w], history


def logreg_score(
    docs: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents with PINNED weights: sigmoid(w·x) rounded to 6
    decimals (the cross-engine libm convention), plus the keep decision.
    Pure row-local JVM expressions — no shuffle, no Python."""
    if len(weights) != N_FEATURES:
        raise ValueError(f"expected {N_FEATURES} weights, got {len(weights)}")
    feats = [F.lit(1.0)] + quality_features(text_col)
    z = feats[0] * F.lit(weights[0])
    for f, wv in zip(feats[1:], weights[1:]):
        z = z + f * F.lit(wv)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        F.col(id_col),
        score.alias("quality_score"),
        (score >= threshold).alias("keep"),
    )
