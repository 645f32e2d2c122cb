"""Wide ↔ long ↔ alternate layout transforms.

The engine's internal canonical form is **long format**
``(col: int, value: double)`` (plus whatever carry-along columns a caller
asks for). The reference has two physical layouts — "conventional"
(instances are rows) and "alternate" (features are rows,
``IterativeFeatureSelection.scala:143-149``) — and both normalize onto this
long form here, which is what makes the two selection paths provably
equivalent (the reference's own differential check,
``CommandLine.scala:167-169``).

All transforms are pure projections/``explode``s: map-side only, no
shuffle, fully pipelined into whatever aggregation follows. ``transpose``
is the one exception (it must shuffle by construction) and is documented
as such.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt_wide(
    df: DataFrame,
    feature_cols: Sequence[str],
    carry_cols: Sequence[str] = (),
    col_ids: Sequence[int] | None = None,
) -> DataFrame:
    """Wide feature columns → long ``(carry..., col, value)``.

    ``col_ids`` overrides the emitted column ids (default: position in
    ``feature_cols``). Implemented with an array-of-structs ``explode`` —
    no shuffle, codegen-friendly.
    """
    ids = list(col_ids) if col_ids is not None else list(range(len(feature_cols)))
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("col"),
                F.col(c).cast("double").alias("value"),
            )
            for i, c in zip(ids, feature_cols)
        ]
    )
    return df.select(*carry_cols, F.explode(structs).alias("_kv")).select(
        *carry_cols, F.col("_kv.col").alias("col"), F.col("_kv.value").alias("value")
    )


def melt_array(
    df: DataFrame,
    array_col: str,
    carry_cols: Sequence[str] = (),
    limit_dims: int | None = None,
) -> DataFrame:
    """Array column → long ``(carry..., col, value)`` via ``posexplode``.

    ``limit_dims`` keeps only the first N positions (column pruning for
    array-packed features — at 100 TB you do not want to explode 64 dims
    when the query touches 16).
    """
    arr = F.col(array_col)
    if limit_dims is not None:
        arr = F.slice(arr, 1, limit_dims)
    return df.select(*carry_cols, F.posexplode(arr).alias("col", "_v")).select(
        *carry_cols, "col", F.col("_v").cast("double").alias("value")
    )


def transpose_to_alternate(
    df: DataFrame,
    feature_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Conventional (instances as rows) → alternate (features as rows).

    Returns ``(id: long, features: array<double>)`` where row *i* carries
    feature *i*'s value for every instance, ordered by ``order_col``
    (mirrors the reference generator's transpose,
    ``functions.scala:64-74``).

    This is a real transpose: one ``explode`` + one ``groupBy(col)`` —
    a single shuffle whose key count equals the number of features. Each
    output row is one feature's full instance vector, so this is only
    sensible when ``num_instances`` fits in a row (the alternate layout's
    inherent constraint, not ours).
    """
    long = melt_wide(df, feature_cols, carry_cols=[order_col])
    return (
        long.groupBy("col")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("value").alias("v")))
            ).alias("_sorted")
        )
        .select(
            F.col("col").cast("long").alias("id"),
            F.col("_sorted.v").alias("features"),
        )
    )
