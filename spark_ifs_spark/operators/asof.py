"""As-of (backward) join — the canonical time-series operator Spark has
no built-in for, composed from existing DataFrame ops.

Each left row is matched with the most recent right row whose timestamp
is ≤ the left row's, per key. Instead of the naive formulation
(range-join then per-left-row argmax — a blowup proportional to match
fan-out), this is the **union + ordered carry-forward** plan:

1. tag and union both sides on the shared ``(keys, ts)`` frame;
2. one window pass per key, ordered by ``(ts, side)`` with right rows
   first at equal timestamps (as-of is inclusive), carrying the last
   non-null right values forward (``F.last(ignorenulls=True)`` over an
   unbounded-preceding frame);
3. keep only left rows.

Cost: ONE shuffle on the key (the window partition) and one sort — the
same price as a sort-merge join, with zero fan-out regardless of how
many right rows precede each left row. Per-key skew behaves like any
window (salt or split hot keys if one key dominates).

Caveat: a genuinely-null value inside a right row is indistinguishable
from "no right row yet" (``ignorenulls`` carries past it); supply a
non-null marker column (e.g. the right row's id) to detect matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: left ⟕ most-recent right (per ``by_cols``,
    ``right.ts ≤ left.ts``). Returns every left row + ``value_cols``
    from the matched right row (null when no right row precedes).

    ``right`` must not carry two rows with the same ``(by, ts)`` —
    pre-aggregate it if it can (the match would be ambiguous).
    """
    by = list(by_cols)
    vals = list(value_cols)
    overlap = set(vals) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l_tag = left.withColumn("_side", F.lit(1))
    for v in vals:
        l_tag = l_tag.withColumn(v, F.lit(None).cast(dict(right.dtypes)[v]))
    r_tag = right.select(*by, ts_col, *vals).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in by and c != ts_col:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *[c for c in left.columns],
        "_side",
        *[F.last(v, ignorenulls=True).over(w).alias(f"_c_{v}") for v in vals],
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    for v in vals:
        out = out.withColumnRenamed(f"_c_{v}", v)
    return out
