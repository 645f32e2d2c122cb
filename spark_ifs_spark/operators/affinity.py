"""Co-occurrence / market-basket affinity over a (basket, item) relation.

The classic retail shape — "parts ordered together" — and the same
operator a training-data pipeline uses for tag co-occurrence, domain
co-citation, or co-engagement graphs. Reference parity: the reference
engine (jacopocav/spark-ifs) has no affinity operator; this is part of
the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Per-basket item cap. Pair expansion is quadratic in basket size, so one
#: pathological basket (a crawler cart with 10^5 items) would emit 10^10
#: pairs from a single row. Baskets are truncated to their ``max_items``
#: smallest item ids BEFORE pair expansion — deterministic (sorted ids),
#: and at TPC-H shapes (<= 7 lineitems/order) the cap never binds.
DEFAULT_MAX_ITEMS = 64


def co_occurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_items: int = DEFAULT_MAX_ITEMS,
) -> DataFrame:
    """``(item_a, item_b, n_baskets)`` — distinct unordered item pairs
    co-occurring in a basket, counted over baskets (``item_a < item_b``).

    Plan (2 shuffles, no join): one hash ``groupBy(basket)`` folds each
    basket to its distinct sorted item array (map-side combined), pairs
    expand MAP-SIDE from the capped array via a nested ``transform`` +
    ``flatten`` (O(k²) per basket, k <= ``max_items``), and one hash
    ``groupBy(pair)`` counts. The naive inverted self-join on the basket
    key shuffles the full (basket, item) relation twice AND builds a
    join — this shape never joins, and the second shuffle carries only
    pair keys. At 100 TB the cost is bounded by Σk² per basket, which
    the cap keeps linear in basket count.
    """
    baskets = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .groupBy("basket")
        .agg(F.slice(F.array_sort(F.collect_set("item")), 1, max_items).alias("items"))
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("items"), i + 2, F.greatest(F.size("items") - i - 1, F.lit(0))
                        ),
                        lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    out = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    if min_count > 1:
        out = out.filter(F.col("n_baskets") >= min_count)
    return out
