"""Greedy forward mRMR selection, conventional encoding (instances = rows).

Functional parity with ``IterativeFeatureSelection.selectColumns``
(``/root/reference/src/main/scala/ifs/ml/feature/IterativeFeatureSelection.scala:24-43``),
re-architected for Catalyst:

Per greedy round the reference runs one job per 1000-column batch that
emits ``(candCol, candVal, otherCol, otherVal)`` tuples and collects ALL
pair counts to the driver (``countByValue`` at ``IFS:97``), then scores on
the driver with Breeze matrices. Here the whole round is ONE declarative
plan:

    wide df (persisted, only needed cols)
      → explode(candidates × (label ∪ selected))       map-side, no shuffle
      → groupBy(cand, cand_val, other, other_val).count()   ← the only
        shuffle; partial aggregation + codegen from Catalyst, and the key
        space is bounded by the 10k-cardinality guard, not by row count
      → window-sum marginals → MI per (cand, other)
      → aggregate to (relevance, mean redundancy) per cand → score
      → orderBy(score desc, col asc) limit 1           ← 1 row to driver

Scale posture: only the winner row crosses to the driver each round
(the reference collects the full pair-count map). Broadcast state is the
selected index list (≤ k ints) embedded as literals. The input is scanned
once per round with column pruning down to label + features still in play.

Tie-break: deterministic lowest-index-wins. The reference's tie order is
nondeterministic driver-hash order (``IFS:37`` stable sort over a hash-map
grouping at ``:104``) — documented deviation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ifs_spark.functions.mi import (
    LABEL_COL_ID,
    MAX_CATEGORIES,
    check_cardinality,
    mi_from_joint_counts,
)
from spark_ifs_spark.operators.scores import ColumnScore, MrmrColumnScore


def round_mi(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    candidates: Sequence[int],
    selected: Sequence[int],
) -> DataFrame:
    """One greedy round's MI terms: ``(cand, other, mi)`` for every
    candidate × (label ∪ selected feature), where ``other`` is
    :data:`LABEL_COL_ID` (−1) for the label.

    This is the reference's single-pass multi-column counting pattern
    (``IFS:65-97``, itself borrowed from mllib's chi-squared test) as one
    explode + one hash aggregate.
    """
    others = [(LABEL_COL_ID, label_col)] + [(s, feature_cols[s]) for s in selected]
    cand_arr = F.array(
        *[
            F.struct(F.lit(c).alias("cand"), F.col(feature_cols[c]).cast("double").alias("cand_val"))
            for c in candidates
        ]
    )
    other_arr = F.array(
        *[
            F.struct(F.lit(o).alias("other"), F.col(name).cast("double").alias("other_val"))
            for o, name in others
        ]
    )
    tuples = (
        df.select(F.explode(cand_arr).alias("_c"), other_arr.alias("_os"))
        .select("_c.cand", "_c.cand_val", F.explode("_os").alias("_o"))
        .select("cand", "cand_val", F.col("_o.other").alias("other"), F.col("_o.other_val").alias("other_val"))
    )
    joint = tuples.groupBy("cand", "other", "cand_val", "other_val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return mi_from_joint_counts(
        joint, group_cols=["cand", "other"], a_col="cand_val", b_col="other_val"
    )


def _aggregate_scores(mi: DataFrame) -> DataFrame:
    """``(cand, other, mi)`` → ``(cand, relevance, redundancy)`` where
    redundancy is the mean MI vs selected features (NULL on round 1)."""
    return mi.groupBy("cand").agg(
        F.sum(F.when(F.col("other") == LABEL_COL_ID, F.col("mi"))).alias("relevance"),
        F.avg(F.when(F.col("other") != LABEL_COL_ID, F.col("mi"))).alias("redundancy"),
    )


def _pick_best(
    a: tuple[int, float] | None, b: tuple[int, float], higher_is_better: bool
) -> tuple[int, float]:
    if a is None:
        return b
    if higher_is_better:
        return b if (b[1] > a[1] or (b[1] == a[1] and b[0] < a[0])) else a
    return b if (b[1] < a[1] or (b[1] == a[1] and b[0] < a[0])) else a


def select_columns(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    num: int,
    score: ColumnScore | None = None,
    batch_size: int = 1000,
    max_categories: int = MAX_CATEGORIES,
) -> list[tuple[int, float]]:
    """Greedily select ``min(num, len(feature_cols))`` features.

    Returns ``[(feature_index, score)]`` in selection order (parity with
    ``IFS:22,42``; the ``min`` cap is ``IFS:31``).

    ``batch_size`` caps how many candidate columns one aggregation job
    explodes (the reference's O1 batching knob, ``IFS:58-63``) — with the
    long-format groupBy it bounds per-job shuffle width, not driver memory.
    """
    if num <= 0:
        raise ValueError("num must be > 0")
    score = score or MrmrColumnScore()
    feature_cols = list(feature_cols)
    num = min(num, len(feature_cols))

    needed = [label_col] + feature_cols
    wide = df.select(*needed).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        check_cardinality(wide, needed, max_categories)
        selected: list[tuple[int, float]] = []
        sel_idx: list[int] = []
        for _ in range(num):
            candidates = [i for i in range(len(feature_cols)) if i not in sel_idx]
            best: tuple[int, float] | None = None
            for start in range(0, len(candidates), batch_size):
                batch = candidates[start : start + batch_size]
                mi = round_mi(wide, label_col, feature_cols, batch, sel_idx)
                expr = score.sql_expr()
                if expr is not None:
                    # JVM-side scoring: argmax never leaves Spark.
                    order = F.col("score").desc() if score.higher_is_better else F.col("score").asc()
                    row = (
                        _aggregate_scores(mi)
                        .withColumn("score", F.expr(expr))
                        .orderBy(order, F.col("cand").asc())
                        .first()
                    )
                    best = _pick_best(best, (int(row["cand"]), float(row["score"])), score.higher_is_better)
                else:
                    # Generic plug-in: collect the (≤ batch × (k+1)) MI terms
                    # and combine driver-side.
                    rel: dict[int, float] = {}
                    reds: dict[int, list[float]] = {}
                    for r in mi.collect():
                        if r["other"] == LABEL_COL_ID:
                            rel[r["cand"]] = float(r["mi"])
                        else:
                            reds.setdefault(r["cand"], []).append(float(r["mi"]))
                    for c in batch:
                        s = score.score(rel.get(c, 0.0), reds.get(c, []))
                        best = _pick_best(best, (c, s), score.higher_is_better)
            assert best is not None
            selected.append(best)
            sel_idx.append(best[0])
        return selected
    finally:
        wide.unpersist()
