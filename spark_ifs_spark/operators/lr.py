"""Distributed logistic-regression training steps (quality-classifier
training).

Production corpus pipelines train small linear classifiers over cheap
document features (fastText-style quality filters: "does this look like
a reference page or boilerplate?") and score every document with them.
The training loop is the interesting Spark shape: full-batch gradient
descent where each iteration is ONE map-side-combined aggregate that
folds per-row gradient contributions into ``d`` cells — the driver
holds only the ``O(d)`` weight vector between iterations, the corpus
never moves, and the shuffle is corpus-size-independent (the
``kmeans_step`` / ``power_iteration`` posture).

Exactness convention: weights live in integer MICRO units. Each row's
gradient contribution is quantized ``floor((σ(w·x) − y)·x_j·1e6)`` to a
BIGINT *before* summation, so per-iteration gradients are exact integer
sums — invariant to partitioning and addition order on both engines —
and the weight update ``w_j −= floor(grad_j·LR_NUM / (LR_DEN·n))`` is
pure integer arithmetic. The only floating steps (the dot product and
the sigmoid) happen per-row from integer-derived literals, reproduced
verbatim by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_gradient_step(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights_micro: list[int],
    n_rows: int,
    lr_num: int = 1,
    lr_den: int = 2,
) -> list[int]:
    """One full-batch GD step; returns the updated integer-micro weights.

    ``margin = Σ_j (w_j_micro / 1e6) · x_j`` (evaluated left-to-right in
    feature order so the float sequence is engine-reproducible),
    ``p = σ(margin)``, per-row contribution ``floor((p − y)·x_j·1e6)``,
    update ``w_j − trunc(Σ·lr_num / (lr_den·n))`` — TRUNCATING integer
    division (toward zero), the semantics SQL ``//`` gives on signed
    integers, so the oracle's update arithmetic is the literal same
    operator (Python ``//`` floors, hence the abs/sign dance below).
    """
    margin: Column = F.lit(0.0)
    for w, c in zip(weights_micro, feature_cols):
        margin = margin + F.lit(w / 1000000.0) * F.col(c)
    p = _sigmoid(margin)
    y = F.col(label_col).cast("double")
    aggs = [
        F.sum(
            F.floor((p - y) * F.col(c) * F.lit(1000000.0)).cast("long")
        ).alias(f"g{j}")
        for j, c in enumerate(feature_cols)
    ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for j, w in enumerate(weights_micro):
        num = int(row[f"g{j}"]) * lr_num
        den = lr_den * n_rows
        q = abs(num) // den  # nonnegative floor-div == truncation
        out.append(w + q if num < 0 else w - q)
    return out


def lr_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 2,
    lr_num: int = 1,
    lr_den: int = 2,
) -> list[int]:
    """``iters`` full-batch GD steps from ``w = 0``; returns integer-micro
    weights. One count + one aggregate per iteration; driver state is
    ``O(d)``."""
    n_rows = df.count()
    w = [0] * len(feature_cols)
    for _ in range(iters):
        w = lr_gradient_step(
            df, feature_cols, label_col, w, n_rows, lr_num, lr_den
        )
    return w


def lr_score_expr(
    feature_cols: list[str], weights_micro: list[int]
) -> Column:
    """``floor(σ(w·x)·1e6)`` as a single column expression — the one
    source of truth for the scoring formula (margin folded
    left-to-right in feature order, the engine-reproducible sequence),
    usable as a plain projection anywhere."""
    margin: Column = F.lit(0.0)
    for w, c in zip(weights_micro, feature_cols):
        margin = margin + F.lit(w / 1000000.0) * F.col(c)
    return F.floor(_sigmoid(margin) * F.lit(1000000.0)).cast("long")


def lr_score(
    df: DataFrame,
    feature_cols: list[str],
    weights_micro: list[int],
    id_col: str,
) -> DataFrame:
    """``(id, score_micro)`` — the scoring pass that applies a trained
    quality classifier corpus-wide. Pure map-side projection, zero
    shuffles (:func:`lr_score_expr`)."""
    return df.select(
        F.col(id_col).alias("id"),
        lr_score_expr(feature_cols, weights_micro).alias("score_micro"),
    )
