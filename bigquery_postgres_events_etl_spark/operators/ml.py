"""In-engine model training — the iterative tier's gradient-descent
member (alongside PageRank / BPE / MMR): the model is driver-side
state (a handful of coefficients — deployment constants in the
making), the DATA never leaves the cluster, and each step is one
partial-aggregated scan. Reference parity vs a NumPy implementation
is pytest-pinned (tests/test_ml.py).

Reference behavior (what the original ETL feeds downstream) — model
scoring exists in queries_analytics.ml_linear_score_users; this
module adds the TRAINING side so the scoring entry's coefficients
can be produced by the engine instead of arriving from a notebook.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOGREG_LR = 0.05
LOGREG_ITERS = 15


def logreg_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = LOGREG_LR,
    n_iters: int = LOGREG_ITERS,
) -> DataFrame:
    """Binary logistic regression by full-batch gradient descent,
    expressed so each iteration is ONE aggregation job:

    - current weights are literals compiled into the scan (model →
      data, never data → driver);
    - the gradient ∇ = Σ (σ(w·x) − y)·x reduces to k+1 partial-
      aggregatable sums — map-side combine does most of the work, the
      shuffle carries one row per partition;
    - the returned model is a (feature, weight) table — the same
      shape ml_linear_score_users consumes.

    Scale: iteration cost is O(scan) with no join, no window, no
    data-sized shuffle; the feature frame is cached once. Driver
    state is k+1 doubles. Convergence and NumPy parity (same lr,
    same iteration count, same float64 math) are pytest-pinned;
    the registry entry is rows-only (iterative, like PageRank/BPE).
    """
    cols = ["__bias"] + list(feature_cols)
    feats = features.select(
        F.lit(1.0).alias("__bias"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).persist()
    n = feats.count()  # materializes the cache; n is needed every step
    w = {c: 0.0 for c in cols}
    for _ in range(n_iters):
        z = None
        for c in cols:
            term = F.col(c) * F.lit(w[c])
            z = term if z is None else z + term
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("__y")
        grad_row = feats.agg(
            *[F.sum(resid * F.col(c)).alias(c) for c in cols]
        ).first()
        for c in cols:
            w[c] = w[c] - lr * grad_row[c] / n
    feats.unpersist()
    spark = features.sparkSession
    return spark.createDataFrame(
        [(c if c != "__bias" else "bias", float(w[c])) for c in cols],
        "feature STRING, weight DOUBLE",
    )


def logreg_train_reference(
    rows: list[tuple],
    n_features: int,
    lr: float = LOGREG_LR,
    n_iters: int = LOGREG_ITERS,
) -> list[float]:
    """Pure-Python/NumPy twin for parity tests: same float64 math,
    same update rule, same iteration count."""
    import numpy as np

    X = np.array([[1.0, *r[:n_features]] for r in rows], dtype=np.float64)
    y = np.array([r[n_features] for r in rows], dtype=np.float64)
    w = np.zeros(n_features + 1)
    for _ in range(n_iters):
        sig = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = (sig - y) @ X
        w = w - lr * grad / len(rows)
    return [float(v) for v in w]


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
