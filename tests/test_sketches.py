"""Count-Min Sketch and logistic-regression-step operator tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_ifs_spark.operators import lr, sketches


@pytest.fixture(scope="module")
def tokens(spark):
    words = (["the"] * 50) + (["spark"] * 20) + (["rare"] * 2) + ["hapax"]
    return spark.createDataFrame([(w,) for w in words], ["w"])


def test_cms_never_underestimates(spark, tokens):
    cms = sketches.cms_build(tokens, "w", depth=4, width=64, seed=9)
    est = {
        r["term"]: r["est"]
        for r in sketches.cms_estimate(
            cms, ["the", "spark", "rare", "hapax", "absent"], depth=4, width=64, seed=9
        ).collect()
    }
    exact = {"the": 50, "spark": 20, "rare": 2, "hapax": 1, "absent": 0}
    for t, c in exact.items():
        assert est[t] >= c, t
    # with 73 tokens in a 4x64 grid, collisions are bounded: the absent
    # term cannot exceed the total stream size, and the heavy term
    # estimate is close to truth
    assert est["the"] <= 73
    assert est["absent"] <= 73


def test_cms_grid_is_bounded(spark, tokens):
    cms = sketches.cms_build(tokens, "w", depth=4, width=64, seed=9)
    assert cms.count() <= 4 * 64
    # every token contributes to exactly `depth` cells
    total = cms.groupBy("r").agg(F.sum("c").alias("s")).collect()
    assert all(row["s"] == 73 for row in total)


def test_cms_merge_is_cell_addition(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["w"])
    b = spark.createDataFrame([("x",), ("z",)], ["w"])
    whole = spark.createDataFrame([("x",), ("y",), ("x",), ("z",)], ["w"])
    kw = dict(depth=3, width=32, seed=5)
    merged = (
        sketches.cms_build(a, "w", **kw)
        .unionByName(sketches.cms_build(b, "w", **kw))
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    direct = sketches.cms_build(whole, "w", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_lr_train_separates_classes(spark):
    # y = 1 iff x1 is large; two well-separated clusters
    rows = [(i, 1.0, 2.0 + (i % 3) * 0.1, 1.0) for i in range(30)]
    rows += [(100 + i, 1.0, -2.0 - (i % 3) * 0.1, 0.0) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "x0", "x1", "y"])
    w = lr.lr_train(df, ["x0", "x1"], "y", iters=3)
    assert w[1] > 0  # positive slope on the separating feature
    scored = {r["id"]: r["score_micro"] for r in lr.lr_score(df, ["x0", "x1"], w, "id").collect()}
    assert min(scored[i] for i in range(30)) > max(scored[100 + i] for i in range(30))


def test_lr_step_matches_numpy_replica(spark):
    import numpy as np

    rows = [(0, 1.0, 0.5, 1.0), (1, 1.0, -0.25, 0.0), (2, 1.0, 1.5, 1.0)]
    df = spark.createDataFrame(rows, ["id", "x0", "x1", "y"])
    w = lr.lr_train(df, ["x0", "x1"], "y", iters=2)

    X = np.array([[1.0, 0.5], [1.0, -0.25], [1.0, 1.5]])
    y = np.array([1.0, 0.0, 1.0])
    wm = [0, 0]
    n = 3
    for _ in range(2):
        margin = X @ (np.array(wm) / 1e6)
        p = 1.0 / (1.0 + np.exp(-margin))
        out = []
        for j in range(2):
            gj = int(np.floor((p - y) * X[:, j] * 1e6).sum())
            q = abs(gj) // (2 * n)
            out.append(wm[j] + q if gj < 0 else wm[j] - q)
        wm = out
    assert w == wm


def test_cms_estimate_on_empty_sketch_is_zero(spark):
    empty = spark.createDataFrame([], "w string")
    cms = sketches.cms_build(empty, "w", depth=3, width=16, seed=1)
    est = {
        r["term"]: r["est"]
        for r in sketches.cms_estimate(cms, ["x"], depth=3, width=16, seed=1).collect()
    }
    assert est == {"x": 0}


# --- portable HyperLogLog ---------------------------------------------------


def test_hll_estimate_within_expected_error(spark):
    from spark_ifs_spark.operators.sketches import hll_distinct

    n = 5000
    df = spark.createDataFrame(
        [("k", f"v{i}") for i in range(n)], "key string, v string"
    )
    est = hll_distinct(df, ["key"], "v", p=9).collect()[0]["est_distinct"]
    # std error ~1.04/sqrt(512) = 4.6%; 3 sigma = 14%
    assert abs(est - n) / n < 0.15, est


def test_hll_small_range_linear_counting(spark):
    from spark_ifs_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("k", f"v{i % 20}") for i in range(400)], "key string, v string"
    )
    est = hll_distinct(df, ["key"], "v", p=9).collect()[0]["est_distinct"]
    # 20 distinct << 2.5m -> linear counting branch, near-exact
    assert abs(est - 20) < 2, est


def test_hll_merge_invariance(spark):
    """Sketching a union equals sketching the parts — the register file
    is a bucket-max, so partition/batch layout cannot change the
    estimate (the property that makes HLL incrementally mergeable)."""
    from spark_ifs_spark.operators.sketches import hll_distinct

    rows = [("k", f"v{i}") for i in range(3000)]
    whole = spark.createDataFrame(rows, "key string, v string")
    shuffled = spark.createDataFrame(rows[::-1], "key string, v string").repartition(7)
    e1 = hll_distinct(whole, ["key"], "v", p=9).collect()[0]["est_distinct"]
    e2 = hll_distinct(shuffled, ["key"], "v", p=9).collect()[0]["est_distinct"]
    assert e1 == e2


def test_hll_matches_duckdb_twin(spark):
    import duckdb

    from spark_ifs_spark.operators.sketches import hll_distinct, sql_hll_distinct

    rows = [(f"t{i % 3}", i * 7919 % 1000) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(df, ["event_type"], "user_id", p=9).collect()
    }
    con = duckdb.connect()
    con.register("events", __import__("pandas").DataFrame(rows, columns=["event_type", "user_id"]))
    want = {
        k: v
        for k, v in con.execute(
            sql_hll_distinct("events", ["event_type"], "user_id", p=9)
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_kmv_sketch_merge_equals_direct_sketch(spark, sf_dir):
    """KMV mergeability: re-sketching the UNION of two shard sketches
    equals sketching the union of the shards directly — the property
    that lets per-shard sketches fold into corpus cardinalities."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.sketches import kmv_estimate, kmv_sketch
    from spark_ifs_spark.operators.topk import salted_topk_per_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.lit("all").alias("g"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    # two shard sketches, keyed by half
    shard_sk = kmv_sketch(terms, ["half"], "term", k=64)
    merged_rows = shard_sk.select("h").distinct().withColumn("g", F.lit("all"))
    merged = salted_topk_per_key(merged_rows, ["g"], "h", k=64, descending=False)
    direct = kmv_sketch(terms, ["g"], "term", k=64)
    m = kmv_estimate(merged, ["g"], k=64).collect()[0]
    d = kmv_estimate(direct, ["g"], k=64).collect()[0]
    assert (m["kth_h"], m["n_sketch"], m["est_distinct"]) == (
        d["kth_h"], d["n_sketch"], d["est_distinct"]
    )
    # and the estimate is sane: within 30% of the exact distinct count
    exact = terms.select("term").distinct().count()
    assert abs(m["est_distinct"] - exact) / exact < 0.30


def test_heavy_hitters_finds_planted_keys_exactly(spark):
    # 1000 tokens: 'hot' 300 (300000 ppm), 'warm' 100 (100000 ppm),
    # 600 singletons — phi at 150000 ppm keeps exactly 'hot'
    words = ["hot"] * 300 + ["warm"] * 100 + [f"u{i}" for i in range(600)]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    out = sketches.cms_heavy_hitters(df, "w", phi_ppm=150_000, depth=4, width=64, seed=9)
    rows = {r["term"]: r for r in out.collect()}
    assert set(rows) == {"hot"}
    assert rows["hot"]["n_exact"] == 300
    # CMS never undercounts, so est >= exact and over_ppm >= 0
    assert rows["hot"]["est"] >= 300
    assert rows["hot"]["over_ppm"] >= 0


def test_heavy_hitters_no_false_negatives_under_collisions(spark):
    # tiny width forces heavy collisions: the shortlist may include
    # false positives, but every true heavy hitter MUST survive (the
    # exact verify pass then reports its true count)
    words = ["a"] * 80 + ["b"] * 60 + [f"u{i}" for i in range(200)] * 2
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    out = sketches.cms_heavy_hitters(df, "w", phi_ppm=100_000, depth=2, width=4, seed=3)
    rows = {r["term"]: r["n_exact"] for r in out.collect()}
    n = len(words)
    assert rows.get("a") == 80 and rows.get("b") == 60
    # the output is EXACTLY the true heavy set (verify kills CMS FPs)
    for term, cnt in rows.items():
        assert cnt * 1_000_000 >= n * 100_000


def test_heavy_hitters_verify_join_is_broadcast(spark):
    words = ["x"] * 10 + ["y"] * 2
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    out = sketches.cms_heavy_hitters(df, "w", phi_ppm=500_000, depth=2, width=8, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_build_rejects_degenerate_grid(spark, tokens):
    with pytest.raises(ValueError):
        sketches.cms_build(tokens, "w", depth=0, width=64)
    with pytest.raises(ValueError):
        sketches.cms_build(tokens, "w", depth=4, width=0)
