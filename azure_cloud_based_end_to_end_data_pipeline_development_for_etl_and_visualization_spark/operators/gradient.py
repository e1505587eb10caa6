"""Distributed batch gradient descent for logistic regression.

The "train a small model on cluster-scale data" loop, Spark-shaped: each
iteration is ONE map-side-combined aggregation over the feature table
(the gradient), the model is a handful of driver-side scalars broadcast
back into the next iteration's expressions as literals (the HWM /
centroid pattern — nothing data-sized ever reaches the driver), and the
feature table is a materialized narrow artifact so iterations scan
columns, not the raw fact.

Determinism: per-row gradient contributions are IEEE arithmetic
(identical on every executor), but a cross-row SUM of doubles is
order-dependent — so each contribution is integerized as
``floor(g * 1e12 + 0.5)`` (the fastagg scheme) and summed exactly.
Training is therefore bit-reproducible under any partitioning/layout,
which tests/test_gradient.py pins (exact equality across repartitions);
a numpy reference agrees to ~1e-6 (libm exp ulps differ between JVM and
numpy — the perplexity precedent — so cross-LIBRARY equality is
approximate even though cross-LAYOUT equality is exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = int(1e12)


def logreg_gd(
    features: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    iters: int = 8,
    lr: float = 1.0,
) -> tuple[list[float], list[float]]:
    """Train logistic regression (bias + ``feature_cols``) by full-batch
    gradient descent; returns (weights, per-iteration mean log-loss).

    ``features`` should be a deterministic, ideally materialized source;
    every iteration runs exactly one aggregation job over it."""
    n = features.count()
    w = [0.0] * (len(feature_cols) + 1)  # bias first
    losses: list[float] = []
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = F.lit(w[0])
        for wj, c in zip(w[1:], feature_cols):
            z = z + F.lit(wj) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        grads = [err] + [err * F.col(c) for c in feature_cols]
        # numerically-safe log-loss (p in (0,1) strictly for finite z)
        ll = -(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))
        agg = features.agg(
            *[
                F.sum(F.floor(g * SCALE + F.lit(0.5)).cast("long")).alias(f"g{j}")
                for j, g in enumerate(grads)
            ],
            F.sum(F.floor(ll * F.lit(1e9) + F.lit(0.5)).cast("long")).alias("ll"),
        ).collect()[0]
        losses.append(agg["ll"] / 1e9 / n)
        w = [
            wj - lr * (agg[f"g{j}"] / SCALE / n)
            for j, wj in enumerate(w)
        ]
    return w, losses


def logreg_readout(
    features: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    w: Sequence[float],
) -> DataFrame:
    """One-row model readout at weights ``w``: n, the weights, exact
    correct-prediction count at the 0.5 threshold, and accuracy."""
    y = F.col(label_col).cast("double")
    z = F.lit(w[0])
    for wj, c in zip(w[1:], feature_cols):
        z = z + F.lit(wj) * F.col(c)
    pred = (z >= 0).cast("double")  # sigmoid(z) >= .5  <=>  z >= 0
    return features.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.lit(float(wj)).alias(f"w{j}") for j, wj in enumerate(w)],
        F.sum(F.when(pred == y, 1).otherwise(0)).cast("long").alias("n_correct"),
        (
            F.sum(F.when(pred == y, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy"),
    )
