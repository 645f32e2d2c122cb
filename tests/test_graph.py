"""connected_components vs a brute-force union-find, incl. chain graphs
(the adversarial-diameter case path halving exists for)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_ifs_spark.operators.graph import (
    cluster_representatives,
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges, max_iter=25):
    """Both strategy paths (driver union-find under the edge budget,
    distributed contraction past it) must match the oracle — and
    therefore each other."""
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _union_find(edges)
    incore = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=max_iter).collect()
    }
    assert incore == want
    dist = {
        r["id"]: r["component"]
        for r in connected_components(
            df, max_iter=max_iter, incore_edge_budget=0
        ).collect()
    }
    assert dist == want
    return incore


def test_two_triangles_and_isolated_pair(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)]
    got = _check(spark, edges)
    assert got[3] == 1 and got[12] == 10 and got[21] == 20


def test_chain_converges_fast(spark):
    # 40-node chain: plain propagation needs 39 rounds; path halving
    # must land it within the 25-round ceiling (expected ~log2(40)+c).
    edges = [(i, i + 1) for i in range(40)]
    got = _check(spark, edges, max_iter=25)
    assert set(got.values()) == {0}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(100))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_cluster_representatives(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = connected_components(df)
    reps = {
        r["component"]: (r["keep_id"], r["n_members"])
        for r in cluster_representatives(comps).collect()
    }
    assert reps == {1: (1, 3), 10: (10, 2)}
