"""Gradient-descent training parity: the distributed aggregation must
walk the same float64 path as a NumPy reference (within double-sum
reordering tolerance), descend the loss, and actually separate a
separable dataset."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.ml import (
    logreg_train,
    logreg_train_reference,
    sigmoid,
)


def _events_features(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").cast("double").alias("n_click"),
        F.count_if(F.col("event_type") == "view").cast("double").alias("n_view"),
        F.count_if(F.col("event_type") == "error").cast("double").alias("n_error"),
        (F.count_if(F.col("event_type") == "purchase") > 0)
        .cast("double")
        .alias("purchased"),
    )


def test_logreg_matches_numpy_reference(spark, sf_dir):
    feats = _events_features(spark, sf_dir)
    got = {r.feature: r.weight for r in logreg_train(
        feats, ["n_click", "n_view", "n_error"], "purchased"
    ).collect()}
    rows = [
        (r.n_click, r.n_view, r.n_error, r.purchased) for r in feats.collect()
    ]
    want = logreg_train_reference(rows, n_features=3)
    names = ["bias", "n_click", "n_view", "n_error"]
    for name, w_ref in zip(names, want):
        # identical update rule; only double-sum ORDER differs between
        # the distributed and the NumPy gradient
        assert math.isclose(got[name], w_ref, rel_tol=1e-9, abs_tol=1e-12), (
            f"{name}: spark {got[name]} vs numpy {w_ref}"
        )


def test_logreg_separates_separable_data(spark):
    """On linearly separable data the trained model must classify the
    training set correctly (sanity that the plumbing optimizes the
    right objective, not just any fixed point)."""
    rows = [(float(x), 1.0 if x > 5 else 0.0) for x in range(11) if x != 5]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    w = {r.feature: r.weight for r in logreg_train(
        df, ["x"], "y", lr=0.5, n_iters=400
    ).collect()}
    for x, y in rows:
        p = sigmoid(w["bias"] + w["x"] * x)
        assert (p > 0.5) == (y == 1.0), f"x={x}: p={p}"


def test_decision_stump_matches_python_reference(spark, sf_dir):
    """Histogram split-search parity: every candidate's counts and
    weighted Gini reproduced by a pure-Python scan (third engine next
    to the DuckDB oracle), and the emitted ranking is the true
    ascending-Gini order."""
    import math

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.registry import all_queries

    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    )
    pairs = [
        (int(math.floor(float(r.o_totalprice) / 1000.0)),
         1 if r.o_orderstatus == "F" else 0)
        for r in o.collect()
    ]
    hist: dict[int, list[int]] = {}
    for b, y in pairs:
        n_pos = hist.setdefault(b, [0, 0])
        n_pos[0] += 1
        n_pos[1] += y
    n_tot = sum(v[0] for v in hist.values())
    p_tot = sum(v[1] for v in hist.values())
    cands = []
    nl = pl = 0
    for b in sorted(hist):
        nl += hist[b][0]
        pl += hist[b][1]
        nr, pr = n_tot - nl, p_tot - pl
        if nr == 0:
            continue

        def gini(p, n):
            fp, fq = p / n, (n - p) / n
            return 1.0 - fp * fp - fq * fq

        wg = (nl / n_tot) * gini(pl, nl) + (nr / n_tot) * gini(pr, nr)
        cands.append(((b + 1) * 1000, nl, pl, nr, pr, wg))
    cands.sort(key=lambda t: (t[5], t[0]))
    want = [
        t + (i + 1,) for i, t in enumerate(cands[:10])
    ]

    rows = (
        all_queries()["ml_decision_stump_train"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    )
    got = [
        (r.threshold, r.nl, r.pl, r.nr, r.pr, r.wgini, r.rank) for r in rows
    ]
    assert got == want


def test_perceptron_matches_python_reference_exactly(spark, sf_dir):
    """The integer batch perceptron must be BIT-IDENTICAL to the
    pure-Python twin — no tolerance: every weight and error count at
    every epoch is an exact integer."""
    from bigquery_postgres_events_etl_spark.operators.ml import (
        perceptron_train,
        perceptron_train_reference,
    )

    e = load_table(spark, sf_dir, "events")
    feats = e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").cast("long").alias("n_click"),
        F.count_if(F.col("event_type") == "view").cast("long").alias("n_view"),
        F.count_if(F.col("event_type") == "error").cast("long").alias("n_error"),
        F.when(F.count_if(F.col("event_type") == "purchase") > 0, 1)
        .otherwise(-1)
        .cast("long")
        .alias("label"),
    )
    got = [
        (r.epoch, r.w_bias, r.w_n_click, r.w_n_view, r.w_n_error, r.n_mis)
        for r in perceptron_train(
            feats, ["n_click", "n_view", "n_error"], "label"
        ).orderBy("epoch").collect()
    ]
    rows = [
        (r.n_click, r.n_view, r.n_error, r.label) for r in feats.collect()
    ]
    want = perceptron_train_reference(rows, n_features=3)
    assert got == want


def test_perceptron_converges_on_separable_data(spark):
    """On linearly separable integer data the batch perceptron reaches
    zero training errors within the epoch budget (the Novikoff bound
    guarantees convergence; this pins that the update rule actually
    optimizes, not just any fixed point)."""
    from bigquery_postgres_events_etl_spark.operators.ml import perceptron_train

    rows = [(x, 1 if x > 5 else -1) for x in range(11) if x != 5]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    traj = perceptron_train(df, ["x"], "y", n_epochs=20).orderBy("epoch").collect()
    assert traj[-1].n_mis == 0
    assert traj[0].n_mis == len(rows)  # zero weights misclassify everything


def test_logreg_hardsigmoid_exact_python_parity(spark):
    """The fixed-point hard-sigmoid GD (the r12 hash-oracle tier of
    ml_logreg_train) must match the pure-Python integer twin
    BIT-FOR-BIT on a planted two-class dataset — every epoch's
    weights AND accuracy count."""
    from bigquery_postgres_events_etl_spark.operators.ml import (
        logreg_hardsigmoid_reference,
        logreg_train_hardsigmoid,
    )

    rows = [
        (x1, x2, 1 if 2 * x1 + x2 > 14 else 0)
        for x1 in range(8)
        for x2 in range(6)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    got = [
        tuple(r)
        for r in logreg_train_hardsigmoid(df, ["x1", "x2"], "y")
        .orderBy("epoch")
        .collect()
    ]
    want = logreg_hardsigmoid_reference(rows, n_features=2)
    assert got == want
    # training actually learns: final accuracy strictly above the
    # zero-weight epoch-0 accuracy
    assert got[-1][-1] > got[0][-1]
    # all-one-class degenerate + empty frames stay well-defined
    ones = spark.createDataFrame(
        [(x, 1) for x in range(5)], "x1 long, y long"
    )
    tr = logreg_train_hardsigmoid(ones, ["x1"], "y").orderBy("epoch").collect()
    assert tr[-1].n_correct == 5
    empty = spark.createDataFrame([], "x1 long, y long")
    etr = logreg_train_hardsigmoid(empty, ["x1"], "y").orderBy("epoch").collect()
    assert len(etr) == 9 and all(
        r.w_bias == 0 and r.w_x1 == 0 and r.n_correct == 0 for r in etr
    )
