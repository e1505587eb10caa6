"""Distributed logistic-regression GD: layout-independence (exact, via
integerized gradient sums), numpy-reference parity (approximate — libm
exp ulps differ between JVM and numpy), monotone loss, and a sane fit."""

from __future__ import annotations

import numpy as np

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.gradient import (
    SCALE,
    logreg_gd,
    logreg_readout,
)


def _toy(spark, parts=4):
    rng = np.random.RandomState(11)
    x1 = rng.uniform(0, 1, 400)
    x2 = rng.uniform(0, 1, 400)
    # separable-ish: label leans on x1 - x2
    y = (x1 - x2 + rng.normal(0, 0.2, 400) > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
    return (
        spark.createDataFrame(rows, ["y", "x1", "x2"]).repartition(parts),
        y,
        x1,
        x2,
    )


def _numpy_gd(y, x1, x2, iters=6, lr=1.0):
    n = len(y)
    X = np.column_stack([np.ones(n), x1, x2])
    w = np.zeros(3)
    losses = []
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        err = p - y
        g = np.array(
            [
                np.sum(np.floor(err * X[:, j] * SCALE + 0.5)) / SCALE / n
                for j in range(3)
            ]
        )
        ll = -(y * np.log(p) + (1 - y) * np.log(1 - p))
        losses.append(np.sum(np.floor(ll * 1e9 + 0.5)) / 1e9 / n)
        w = w - lr * g
    return w, losses


def test_logreg_gd_layout_independent_and_matches_numpy(spark):
    df1, y, x1, x2 = _toy(spark, parts=1)
    df7, *_ = _toy(spark, parts=7)
    w1, l1 = logreg_gd(df1, "y", ["x1", "x2"], iters=6, lr=1.0)
    w7, l7 = logreg_gd(df7, "y", ["x1", "x2"], iters=6, lr=1.0)
    assert w1 == w7 and l1 == l7  # integerized sums: EXACT across layouts
    wn, ln = _numpy_gd(y, x1, x2, iters=6, lr=1.0)
    assert np.allclose(w1, wn, atol=1e-6)
    assert np.allclose(l1, ln, atol=1e-6)


def test_logreg_gd_loss_decreases_and_beats_majority(spark):
    df, y, _, _ = _toy(spark)
    w, losses = logreg_gd(df, "y", ["x1", "x2"], iters=6, lr=1.0)
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    row = logreg_readout(df, "y", ["x1", "x2"], w).collect()[0]
    majority = max(np.mean(y), 1 - np.mean(y))
    assert row["n"] == 400
    assert row["accuracy"] > majority
    assert row["n_correct"] == int(row["accuracy"] * 400 + 0.5)
