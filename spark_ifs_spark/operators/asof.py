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

from pyspark.sql import Column, DataFrame, Window
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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Scalable interval-overlap join: every (a, b) row pair whose
    ``[start, end]`` intervals intersect (inclusive) — the range join
    Spark has no native operator for, built as the standard **binned
    grid join**: each interval explodes to its covered
    ``floor(t / bin_width)`` bins, pairs meet on a bin equi-join, and
    each qualifying pair is attributed to EXACTLY ONE bin — the bin of
    ``greatest(a_start, b_start)``, which both intervals necessarily
    cover when they overlap — so there is no distinct/dedup pass at
    all. A final exact predicate removes same-bin non-overlaps.

    Start/end columns must be numeric (e.g. epoch micros). Shuffle
    volume is rows × interval-length/bin_width; pick ``bin_width``
    near the typical interval length so most intervals explode to 1-2
    bins (the knob every production range join exposes). Equi-keys can
    ride in ``extra_condition`` post-join; columns from both sides are
    kept (a's then b's — alias before calling on name clashes).

    Skew posture: tasks partition by TIME BIN, not by any key column,
    so a hot key (one user holding half the corpus's sessions) does NOT
    concentrate into one task as long as its intervals are spread over
    time — each bin's join input stays ≈ rows-per-bin (pinned by
    ``test_asof.py::test_interval_join_hot_user_skew``). The residual
    case — k intervals genuinely overlapping the SAME instant — is
    output-bound, not a plan pathology: those k² pairs ARE the answer.
    If a corpus has degenerate co-temporal floods whose pairs the
    caller doesn't want, cap them upstream (filter/sample per key per
    bin — the ``max_bucket`` policy of the dedup operators); this join
    never silently drops a qualifying pair.
    """
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be > 0")

    def bins(start: str, end: str) -> Column:
        return F.explode(
            F.sequence(
                (F.col(start) / w).cast("long"), (F.col(end) / w).cast("long")
            )
        )

    ab = a.withColumn("_bin", bins(a_start, a_end))
    bb = b.withColumn("_bin", bins(b_start, b_end))
    joined = ab.join(bb, "_bin")
    attributed = joined.filter(
        F.col("_bin")
        == (F.greatest(F.col(a_start), F.col(b_start)) / w).cast("long")
    )
    overlap = attributed.filter(
        (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
    )
    if extra_condition is not None:
        overlap = overlap.filter(extra_condition)
    return overlap.drop("_bin")
