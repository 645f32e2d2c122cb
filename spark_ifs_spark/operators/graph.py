"""Connected components over a pair relation — the pairs → clusters step
of a dedup pipeline.

Near-dup detection (minhash LSH, simhash, embedding blocking) emits
*pairs*; deduplication needs *clusters* ("keep one doc per component of
the similarity graph"). This is the canonical iterative-graph step a
100 TB pipeline runs after any pairwise stage.

Algorithm: min-label propagation with **path halving** — each iteration
(a) pulls the minimum neighbor label one hop and (b) replaces every
node's label with its label's label (pointer jumping). Plain propagation
needs O(diameter) rounds; the halving step collapses chains
geometrically, giving O(log n) rounds on adversarial graphs while
costing only one extra label-keyed self-join per round. This is the
two-phase shape of the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame joins.

Scale posture per iteration: two shuffles keyed on node id plus one on
label — all keyed on ids, never on payloads; the label relation has one
row per *node in any pair* (≪ corpus size for a near-dup graph).
``localCheckpoint(eager=True)`` truncates lineage every round so plan
depth stays O(1) regardless of iteration count; on a real cluster with
unreliable executors swap for reliable ``checkpoint()`` against a
checkpoint dir (localCheckpoint pins blocks to executors).

The reference engine has no graph stage (its selection loop is
driver-coordinated, ``InformationThFS.scala``); this is pipeline-extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """``(id, component)`` for every node appearing in ``edges``;
    ``component`` is the minimum node id of the connected component.

    Converges in O(log n) iterations via min-neighbor propagation +
    path halving; raises if ``max_iter`` rounds pass without a fixpoint
    (silent truncation would mislabel — fail loud instead).
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialized once, re-joined every round
    sym = sym.repartition("b").localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )

    prev_sum = object()  # sentinel: never equal on the first round
    for _ in range(max_iter):
        # (a) pull the min label across one hop
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["comp"], F.coalesce("nbr_comp", labels["comp"])
                ).alias("comp"),
            )
        )
        # (b) path halving: comp <- label(comp). A node's label is always
        # ≤ its id, so the lookup side is the same relation.
        l = stepped.alias("l")
        m = stepped.alias("m")
        halved = l.join(m, F.col("l.comp") == F.col("m.id"), "left").select(
            F.col("l.id").alias("id"),
            F.least(
                F.col("l.comp"), F.coalesce(F.col("m.comp"), F.col("l.comp"))
            ).alias("comp"),
        )
        halved = halved.localCheckpoint(eager=True)
        # fixpoint test: labels only ever decrease (least() always keeps
        # the node's own comp as a candidate), so the label sum strictly
        # decreases until convergence — an unchanged sum IS the fixpoint,
        # for the cost of one bounded aggregate instead of a join+count.
        # decimal(38,0) keeps the sum exact out to ~10^38 (no i64 wrap).
        cur_sum = halved.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = halved
        if cur_sum == prev_sum:
            return labels.select("id", F.col("comp").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def cluster_representatives(
    components: DataFrame, keep: str = "min"
) -> DataFrame:
    """``(component, keep_id, n_members)`` — one winner per cluster.

    With min-id components the winner IS the component label; computed
    with an aggregate anyway so a different ``keep`` policy (e.g. max)
    slots in without relabeling.
    """
    agg = F.min("id") if keep == "min" else F.max("id")
    return components.groupBy("component").agg(
        agg.alias("keep_id"), F.count(F.lit(1)).alias("n_members")
    )
