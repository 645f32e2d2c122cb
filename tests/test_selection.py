"""DSIR importance-resampling operator (operators/selection.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_ifs_spark.operators.selection import (
    dsir_scores,
    dsir_top_k,
    hashed_token_buckets,
)


def _docs(spark):
    rows = [
        (1, "spark join join spark", "en"),
        (2, "la mesa verde azul", "es"),
        (3, "spark join shuffle window", "en"),
        (4, "mesa mesa azul la", "es"),
        (5, "spark window batch", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_buckets_count_occurrences(spark):
    df = _docs(spark)
    tb = hashed_token_buckets(df, "doc_id", "text", 64)
    # one row per occurrence, duplicates preserved
    assert tb.count() == sum(len(t.split()) for _, t, _ in df.collect())
    assert tb.filter((F.col("b") < 0) | (F.col("b") >= 64)).count() == 0


def test_dsir_scores_match_numpy_model(spark):
    """Differential oracle: recompute the smoothed LLR model in plain
    Python over the same md5 buckets."""
    from spark_ifs_spark.functions.hashing import md5_int60_py

    B, alpha = 64, 1.0
    df = _docs(spark)
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in df.collect()]
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, text, lang in rows:
        for w in text.split():
            b = md5_int60_py(w) % B
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    expected = {}
    for doc_id, text, _ in rows:
        s = 0.0
        for w in text.split():
            b = md5_int60_py(w) % B
            s += math.log((ct.get(b, 0) + alpha) / (nt + alpha * B))
            s -= math.log((cr[b] + alpha) / (nr + alpha * B))
        expected[doc_id] = s
    got = {
        r["id"]: r["score"]
        for r in dsir_scores(
            df, "doc_id", "text", F.col("lang") == "en", num_buckets=B, alpha=alpha
        ).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9, k


def test_dsir_target_docs_score_higher(spark):
    df = _docs(spark)
    sc = dsir_scores(df, "doc_id", "text", F.col("lang") == "en", num_buckets=64)
    got = {r["id"]: r["score"] for r in sc.collect()}
    en = [got[i] for i in (1, 3, 5)]
    es = [got[i] for i in (2, 4)]
    assert min(en) > max(es)


def test_dsir_top_k_rank_and_ties(spark):
    sc = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 3.0), (4, -1.0)], "id long, score double"
    )
    out = dsir_top_k(sc, 3).collect()
    assert [(r["rank"], r["id"]) for r in out] == [(1, 2), (2, 3), (3, 1)]


def test_dsir_weight_join_is_broadcast(spark):
    """The bucket-weight join must be a broadcast hash join — the
    B-row weight relation never drives a shuffle of the token stream."""
    df = _docs(spark)
    plan = dsir_scores(
        df, "doc_id", "text", F.col("lang") == "en", num_buckets=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_token_budget_waterfill_matches_bisection(spark):
    """Differential oracle: the closed-form saturation-prefix
    allocation equals a bisection solve of sum(min(n, lam*p)) = B."""
    import random

    from spark_ifs_spark.operators.sampling import token_budget_allocation

    def brute(ns, frac, alpha=0.5):
        tot = sum(ns.values())
        budget = math.floor(frac * tot)
        p = {s: n ** alpha for s, n in ns.items()}
        lo, hi = 0.0, 1e18
        for _ in range(200):
            mid = (lo + hi) / 2
            if sum(min(n, mid * p[s]) for s, n in ns.items()) < budget:
                lo = mid
            else:
                hi = mid
        lam = (lo + hi) / 2
        return {s: min(n, lam * p[s]) for s, n in ns.items()}, budget

    rng = random.Random(7)
    for frac in (0.1, 0.5, 1.0):
        ns = {f"s{i}": rng.randint(10, 10 ** rng.randint(2, 7)) for i in range(7)}
        df = spark.createDataFrame(list(ns.items()), "source string, n long")
        got = {
            r["source"]: r
            for r in token_budget_allocation(df, "source", "n", frac).collect()
        }
        want, budget = brute(ns, frac)
        for s, n in ns.items():
            assert got[s]["alloc_tok"] <= n
            assert abs(got[s]["alloc_tok"] - want[s]) <= 2, (frac, s)
        total = sum(r["alloc_tok"] for r in got.values())
        assert budget - len(ns) <= total <= budget + len(ns)


def test_token_budget_full_budget_saturates_all(spark):
    from spark_ifs_spark.operators.sampling import token_budget_allocation

    df = spark.createDataFrame(
        [("a", 100), ("b", 10000), ("c", 7)], "source string, n long"
    )
    out = {r["source"]: r for r in
           token_budget_allocation(df, "source", "n", 1.0).collect()}
    assert all(out[s]["alloc_tok"] == n for s, n in [("a", 100), ("b", 10000), ("c", 7)])
    assert all(r["rate_ppm"] == 1000000 for r in out.values())


def test_token_budget_temperature_favors_small_sources(spark):
    """alpha = 0.5 gives small sources a higher sampling RATE than big
    ones (temperature flattening), while the cap keeps every rate <= 1."""
    from spark_ifs_spark.operators.sampling import token_budget_allocation

    df = spark.createDataFrame(
        [("small", 1000), ("big", 1000000)], "source string, n long"
    )
    out = {r["source"]: r for r in
           token_budget_allocation(df, "source", "n", 0.3).collect()}
    assert out["small"]["rate_ppm"] > out["big"]["rate_ppm"]
    assert all(r["rate_ppm"] <= 1000000 for r in out.values())


def test_rendezvous_shard_minimal_movement(spark):
    """Adding a shard moves only docs stolen BY the new shard —
    rendezvous's defining property (mod-hashing moves ~ (S-1)/S)."""
    from spark_ifs_spark.operators.sampling import rendezvous_shard

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    s8 = rendezvous_shard(df, "doc_id", 8).withColumnRenamed("shard", "s8")
    both = rendezvous_shard(s8, "doc_id", 9)
    rows = both.collect()
    moved = [r for r in rows if r["shard"] != r["s8"]]
    # every mover goes TO the new shard, never between old shards
    assert all(r["shard"] == 8 for r in moved)
    # expected n/9 ~ 55; allow generous band
    assert 20 <= len(moved) <= 110
    # stability: assignment is a pure function of the id
    again = {r["doc_id"]: r["shard"] for r in
             rendezvous_shard(df, "doc_id", 8).collect()}
    assert all(again[r["doc_id"]] == r["s8"] for r in rows)


def test_rendezvous_shard_is_map_side_only(spark):
    from spark_ifs_spark.operators.sampling import rendezvous_shard

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = rendezvous_shard(df, "doc_id", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rendezvous_shard_sql_twin_matches(spark):
    import duckdb

    from spark_ifs_spark.operators.sampling import rendezvous_shard, sql_rendezvous_shard

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["shard"] for r in rendezvous_shard(df, "doc_id", 5).collect()}
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {sql_rendezvous_shard('doc_id', 5)} AS s"
            " FROM (SELECT unnest(range(200)) AS doc_id)"
        ).fetchall()
    )
    assert got == want


def test_doremi_weights_match_numpy_update(spark):
    """Differential test: the DataFrame multiplicative-weights update
    reproduces a numpy reference computed from the SAME per-domain
    bigram losses."""
    import math

    from spark_ifs_spark.operators.selection import doremi_weights
    from spark_ifs_spark.operators.textstats import bigram_logprob

    rows = [
        (1, "easy", "a b a b a b a b"),
        (2, "easy", "a b a b a b"),
        (3, "hard", "x y z q r s t u"),
        (4, "hard", "y x q z s r u t"),
        (5, "mid", "a b x y a b x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    eta, c = 5.0, 0.25

    # numpy/python reference from the operator's own per-doc LM relation
    per_doc = {
        r["id"]: (r["n_bigrams"], r["ll_micronats"])
        for r in bigram_logprob(df, "doc_id", "text").collect()
    }
    dom_of = {i: s for i, s, _ in rows}
    agg: dict[str, list[int]] = {}
    for i, (n, ll) in per_doc.items():
        a = agg.setdefault(dom_of[i], [0, 0])
        a[0] += n
        a[1] += ll
    loss = {s: math.floor(-ll / n) for s, (n, ll) in agg.items()}
    base = min(loss.values())
    ew = {s: math.exp(eta * (l - base) / 1e6) for s, l in loss.items()}
    tot = sum(ew.values())
    want = {
        s: math.floor(round((1 - c) * v / tot + c / len(ew), 9) * 1e6)
        for s, v in ew.items()
    }

    got = {
        r["domain"]: (r["loss_micro"], r["excess_micro"], r["rate_ppm"])
        for r in doremi_weights(
            df, "source", "doc_id", "text", eta=eta, smoothing=c
        ).collect()
    }
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == loss[s]
        assert got[s][1] == loss[s] - base
        assert got[s][2] == want[s]
    # hard domain gains mass over easy; smoothing keeps everything > c/S/2
    assert got["hard"][2] > got["easy"][2]
    assert all(v[2] > 1e6 * c / len(want) / 2 for v in got.values())
