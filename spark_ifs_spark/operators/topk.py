"""Skew-safe grouped top-k.

``row_number() OVER (PARTITION BY key ORDER BY …)`` sends EVERY row of a
hot key through one task — the classic skew collapse at 100 TB (one
`event_type` being 50% of traffic means one straggler task holding 50%
of the data). :func:`salted_topk_per_key` is the two-stage fix:

1. salt each row deterministically into ``buckets`` sub-partitions of
   its key and take a per-(key, salt) top-k — hot keys now spread over
   ``buckets`` tasks, and at most ``k × buckets`` rows per key survive;
2. take the final top-k per key over that bounded intermediate.

Stage 2's window input is ≤ ``k × buckets`` rows per key regardless of
input skew, so no task ever sees more than that. Results are identical
to the single-stage window because a key's global top-k is contained in
the union of its per-salt top-ks.

Ordering must be total (pass ``tiebreak_cols``) — this is what makes the
result, and the DuckDB oracle comparison, deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_col: str, descending: bool, tiebreak_cols: Sequence[str]) -> list[Column]:
    lead = F.col(order_col).desc() if descending else F.col(order_col).asc()
    return [lead, *[F.col(c).asc() for c in tiebreak_cols]]


def salted_topk_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = True,
    buckets: int = 16,
) -> DataFrame:
    """Top-``k`` rows per key under a total order, skew-safely.

    Returns the input columns plus ``rank`` (1-based). The salt is a
    round-robin over ``monotonically_increasing_id()`` — uniform under
    ANY value distribution (a content hash would collapse a hot key's
    duplicate values into one bucket, resurrecting the straggler), and
    deterministic given the input partitioning, which is the same
    guarantee Spark's own id generation gives. Correctness never
    depends on WHICH salt a row gets: stage 2 re-ranks, and a key's
    global top-k is contained in the union of its per-salt top-ks under
    any assignment.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = _order_cols(order_col, descending, tiebreak_cols)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    stage1 = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        stage1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("_salt")
    )


def topk_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = True,
) -> DataFrame:
    """Single-stage window top-k (the small-data / unskewed baseline;
    semantically identical to :func:`salted_topk_per_key`)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_col, descending, tiebreak_cols))
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def compact_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per key: the row with the greatest ``(order_col,
    tiebreak_cols...)`` — CDC/changelog compaction ("current state of
    every entity from its event feed"), the first step of turning an
    append-only event lake into a snapshot table.

    Plan: ``max(struct(order, tiebreaks, payload))`` — ONE hash
    aggregate with map-side partial combine, so a hot key reduces
    locally on every input partition before a single shuffled row per
    (partition, key) moves. Compare the window formulation
    (``row_number() OVER (PARTITION BY key ORDER BY ...)``): that sorts
    and shuffles every version of every key to one task — the classic
    compaction skew-killer when one entity has 10^8 updates. The
    struct comparison is lexicographic by field order, so ties resolve
    by the tiebreak columns and the result is deterministic whenever
    (order, tiebreaks) is unique per key.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in df.columns if c not in keys]
    ordered = F.struct(
        F.col(order_col).alias("_o"),
        *[F.col(c).alias(f"_t{i}") for i, c in enumerate(tiebreak_cols)],
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
    )
    return (
        df.groupBy(*keys)
        .agg(F.max(ordered).alias("_best"))
        .select(*keys, *[F.col(f"_best._p.{c}").alias(c) for c in payload])
    )
