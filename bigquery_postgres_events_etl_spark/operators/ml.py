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


PERCEPTRON_EPOCHS = 8


def perceptron_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_epochs: int = PERCEPTRON_EPOCHS,
) -> DataFrame:
    """Batch perceptron (Rosenblatt's rule, full-batch variant) with
    EXACT INTEGER arithmetic — the hash-oracle member of the in-engine
    training tier beside the float-iterative :func:`logreg_train`:

    - weights start at 0 and update w += Σ_{y·(w·x) ≤ 0} y·x with unit
      learning rate, so every weight is an exact BIGINT at every epoch
      — bit-replayable cross-engine (the fixed-point-pagerank pattern
      applied to model training);
    - each epoch is ONE partial-aggregated scan with the current
      weights compiled in as literals: the misclassified-sum per
      feature and the error count reduce map-side, the shuffle carries
      one row per partition, and only a (k+2)-value scalar row reaches
      the driver (the bounded-collect contract);
    - the returned frame is the full trajectory — one row per epoch
      (epoch, weights, n_mis under those weights) — so the oracle
      hash-checks every update, not just the final model.

    ``label_col`` must be ±1. Scale: iteration cost is O(scan), no
    join, no window, no data-sized shuffle; the integer feature frame
    is cached once. Exact pure-Python parity is pytest-pinned
    (tests/test_ml.py).
    """
    cols = ["__bias"] + list(feature_cols)
    feats = features.select(
        F.lit(1).cast("long").alias("__bias"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("__y"),
    ).persist()
    w = dict.fromkeys(cols, 0)
    out_rows = []
    for epoch in range(n_epochs + 1):
        margin = None
        for c in cols:
            term = F.col(c) * F.lit(w[c])
            margin = term if margin is None else margin + term
        mis = (F.col("__y") * margin) <= 0
        agg = feats.agg(
            F.count_if(mis).alias("__n_mis"),
            *[
                F.sum(F.when(mis, F.col("__y") * F.col(c)).otherwise(F.lit(0))).alias(c)
                for c in cols
            ],
        ).first()
        out_rows.append((epoch, *[w[c] for c in cols], agg["__n_mis"]))
        if epoch < n_epochs:
            for c in cols:
                w[c] = w[c] + (agg[c] or 0)
    feats.unpersist()
    spark = features.sparkSession
    w_names = ["w_bias"] + [f"w_{c}" for c in feature_cols]
    schema = (
        "epoch BIGINT, "
        + ", ".join(f"{n} BIGINT" for n in w_names)
        + ", n_mis BIGINT"
    )
    return spark.createDataFrame(out_rows, schema)


def perceptron_train_reference(
    rows: list[tuple],
    n_features: int,
    n_epochs: int = PERCEPTRON_EPOCHS,
) -> list[tuple]:
    """Pure-Python integer twin for exact-parity tests: same update
    rule, same epoch count, plain ints throughout. ``rows`` are
    (x1..xk, y) with y ∈ {−1, +1}."""
    w = [0] * (n_features + 1)
    out = []
    for epoch in range(n_epochs + 1):
        mis = [
            (1, *r[:n_features], r[n_features])
            for r in rows
            if r[n_features]
            * (w[0] + sum(wi * xi for wi, xi in zip(w[1:], r[:n_features])))
            <= 0
        ]
        out.append((epoch, *w, len(mis)))
        if epoch < n_epochs:
            for j in range(n_features + 1):
                w[j] += sum(m[n_features + 1] * m[j] for m in mis)
    return out


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


HS_SCALE = 10**6
HS_EPOCHS = 8
HS_LR_DEN = 1000


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — spelled sign-explicitly
    so Python, Spark SQL ``div`` and DuckDB ``//`` (whose negative-
    operand semantics differ) all agree: operands handed to the engine
    division are always non-negative."""
    return a // b if a >= 0 else -((-a) // b)


def logreg_train_hardsigmoid(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_epochs: int = HS_EPOCHS,
    scale: int = HS_SCALE,
    lr_den: int = HS_LR_DEN,
) -> DataFrame:
    """Logistic-regression gradient descent with the HARD-SIGMOID
    activation in EXACT fixed-point integer arithmetic — the
    hash-oracle member of the training tier that covers the logistic
    UPDATE semantics (residual-proportional, y ∈ {0,1}), completing
    what :func:`perceptron_train` did for the sign-based update:

    - σ is replaced by the piecewise-linear hard sigmoid
      hσ(z) = clamp(1/2 + z/4, 0, 1) — the standard quantized-network
      stand-in (Courbariaux et al. 2015's binarized-net activation);
      in fixed point at ``scale`` S: p = clamp(S/2 + z div 4, 0, S),
      every term a BIGINT, truncation spelled sign-explicitly so both
      engines agree on negative z;
    - full-batch update w += truncdiv(Σ (y·S − p)·x, lr_den · n) with
      lr = 1/lr_den — residual-proportional like true logistic GD
      (the perceptron only counts misclassifications), yet exactly
      replayable as a recursive CTE;
    - each epoch is ONE partial-aggregated scan with the current
      weights compiled in as literals; only a (k+2)-value scalar row
      reaches the driver (bounded-collect contract);
    - output is the full trajectory: (epoch, weights…, n_correct)
      where n_correct counts rows with prediction 1{2p ≥ S} == y, so
      the oracle hash-checks every update AND the per-epoch accuracy.

    Overflow bound (shared with the DuckDB BIGINT twin): |z| ≤
    Σ|w|·max|x| and |g| ≤ n·S·max|x| must stay below 2⁶³ — safe for
    n up to ~9e12 rows at S=1e6, max|x|=10³.

    ``label_col`` must be 0/1. Scale: iteration cost is O(scan), no
    join, no window, no data-sized shuffle; the integer feature frame
    is cached once. Exact pure-Python parity is pytest-pinned
    (tests/test_ml.py).
    """
    cols = ["__bias"] + list(feature_cols)
    feats = features.select(
        F.lit(1).cast("long").alias("__bias"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("__y"),
    ).persist()
    n = feats.count()
    w = dict.fromkeys(cols, 0)
    out_rows = []
    for epoch in range(n_epochs + 1):
        z = " + ".join(f"({w[c]} * `{c}`)" for c in cols)
        zq = f"(CASE WHEN ({z}) >= 0 THEN ({z}) div 4 ELSE -((-({z})) div 4) END)"
        p = f"GREATEST(0, LEAST({scale}, {scale // 2} + {zq}))"
        r = f"(`__y` * {scale} - {p})"
        agg = feats.agg(
            F.expr(
                f"COUNT_IF((CASE WHEN 2 * {p} >= {scale} THEN 1 ELSE 0 END)"
                " = `__y`)"
            )
            .cast("long")
            .alias("__n_correct"),
            *[F.expr(f"SUM({r} * `{c}`)").cast("long").alias(c) for c in cols],
        ).first()
        out_rows.append((epoch, *[w[c] for c in cols], agg["__n_correct"] or 0))
        if epoch < n_epochs:
            for c in cols:
                # max(n,1) mirrors the oracle's GREATEST — the empty
                # frame degenerates to a zero-weight trajectory on
                # both engines instead of a divide-by-zero
                w[c] = w[c] + _tdiv(int(agg[c] or 0), lr_den * max(n, 1))
    feats.unpersist()
    spark = features.sparkSession
    w_names = ["w_bias"] + [f"w_{c}" for c in feature_cols]
    schema = (
        "epoch BIGINT, "
        + ", ".join(f"{nm} BIGINT" for nm in w_names)
        + ", n_correct BIGINT"
    )
    return spark.createDataFrame(out_rows, schema)


def logreg_hardsigmoid_reference(
    rows: list[tuple],
    n_features: int,
    n_epochs: int = HS_EPOCHS,
    scale: int = HS_SCALE,
    lr_den: int = HS_LR_DEN,
) -> list[tuple]:
    """Pure-Python integer twin for exact-parity tests: same hard
    sigmoid, same truncations, plain ints throughout. ``rows`` are
    (x1..xk, y) with y ∈ {0, 1}."""
    n = len(rows)
    w = [0] * (n_features + 1)
    out = []
    for epoch in range(n_epochs + 1):

        def p(row):
            z = w[0] + sum(wi * xi for wi, xi in zip(w[1:], row[:n_features]))
            return max(0, min(scale, scale // 2 + _tdiv(z, 4)))

        n_correct = sum(
            1
            for row in rows
            if (1 if 2 * p(row) >= scale else 0) == row[n_features]
        )
        out.append((epoch, *w, n_correct))
        if epoch < n_epochs:
            g = [0] * (n_features + 1)
            for row in rows:
                r = row[n_features] * scale - p(row)
                g[0] += r
                for j in range(n_features):
                    g[j + 1] += r * row[j]
            w = [
                w[j] + _tdiv(g[j], lr_den * max(n, 1))
                for j in range(n_features + 1)
            ]
    return out
