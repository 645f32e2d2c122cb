"""Mutual information as pure DataFrame aggregates.

Reference semantics (``/root/reference/src/main/scala/ifs/ml/stats/MutualInformation.scala``):
``MI = Σ_cells p_xy · ln(p_xy / (p_x · p_y))`` over a contingency table of
joint counts, **natural log** (``MutualInformation.scala:74``), cells with
zero joint count skipped (the ``p_xy == 0`` guard at ``:73-74``).

Where the reference builds Breeze matrices on the driver
(``IterativeFeatureSelection.scala:118-134``), we keep joint counts as a
distributed DataFrame ``(group..., a_val, b_val, cnt)`` and compute MI with
window sums — marginals are window aggregates partitioned by the group key,
so one MI value per group key comes out of a single shuffle-free pass over
the (tiny, cardinality-bounded) counts relation.

Scale notes: the counts relation after ``groupBy().count()`` has at most
``groups × |A| × |B|`` rows and the cardinality guard bounds ``|A|,|B| ≤ 10k``,
so everything downstream of the one big counting aggregation is small no
matter how many input rows there were. The counting aggregation itself gets
map-side partial aggregation + whole-stage codegen from Catalyst for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Sentinel "column id" for the label, matching the reference's ``-1``
#: (``IterativeFeatureSelection.scala:93``).
LABEL_COL_ID = -1

#: Reference cardinality guard: at most 10k distinct values per column
#: (``IterativeFeatureSelection.scala:57,72-82``).
MAX_CATEGORIES = 10_000


def mi_from_joint_counts(
    joint: DataFrame,
    group_cols: Sequence[str],
    a_col: str = "a_val",
    b_col: str = "b_val",
    count_col: str = "cnt",
    out_col: str = "mi",
) -> DataFrame:
    """MI per group from a joint-counts relation.

    ``joint`` holds one row per non-empty contingency cell:
    ``(group..., a_val, b_val, cnt)``. Returns ``(group..., mi)``.

    Empty cells are naturally absent from a ``groupBy().count()`` result, so
    the reference's zero-cell skip is implicit.
    """
    group = list(group_cols)
    w_all = Window.partitionBy(*group)
    w_a = Window.partitionBy(*group, a_col)
    w_b = Window.partitionBy(*group, b_col)
    cnt = F.col(count_col).cast("double")
    n = F.sum(count_col).over(w_all).cast("double")
    ca = F.sum(count_col).over(w_a).cast("double")
    cb = F.sum(count_col).over(w_b).cast("double")
    # p_xy*ln(p_xy/(p_x*p_y)) == (c/n) * ln(c*n/(ca*cb))
    term = (cnt / n) * F.log(cnt * n / (ca * cb))
    termed = joint.select(*group, term.alias("_mi_term"))
    if group:
        return termed.groupBy(*group).agg(F.sum("_mi_term").alias(out_col))
    return termed.agg(F.sum("_mi_term").alias(out_col))


def joint_counts(df: DataFrame, a: str | Column, b: str | Column) -> DataFrame:
    """Contingency counts of two columns: ``(a_val, b_val, cnt)``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return df.groupBy(a.alias("a_val"), b.alias("b_val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def mutual_information_df(df: DataFrame, a: str | Column, b: str | Column) -> DataFrame:
    """One-row DataFrame with the MI of two categorical columns."""
    return mi_from_joint_counts(joint_counts(df, a, b), group_cols=[])


def mutual_information(df: DataFrame, a: str | Column, b: str | Column) -> float:
    """Scalar MI of two categorical columns (runs a job)."""
    row = mutual_information_df(df, a, b).first()
    return float(row["mi"]) if row["mi"] is not None else 0.0


def check_cardinality(df: DataFrame, cols: Sequence[str], max_categories: int = MAX_CATEGORIES) -> None:
    """Pre-flight cardinality guard (reference: streamed during counting,
    ``IterativeFeatureSelection.scala:66-82``; ours is a single cheap
    ``approx_count_distinct`` pass with a clean error instead of a
    mid-job crash).

    ``approx_count_distinct`` default rsd is 5%; we compare against
    ``1.2 × max`` to avoid false positives, which keeps the guard
    advisory-cheap at 100 TB (no exact distinct shuffle).
    """
    aggs = [F.approx_count_distinct(c).alias(c) for c in cols]
    row = df.agg(*aggs).first()
    for c in cols:
        if row[c] > max_categories * 1.2:
            raise ValueError(
                f"column {c!r} has ~{row[c]} distinct values, exceeding the "
                f"{max_categories} category limit"
            )
