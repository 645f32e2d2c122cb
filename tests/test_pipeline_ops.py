"""Unit tests for the training-pipeline structural operators
(sampling, chunking/packing, scrubbing, decontamination, tf-idf).
The registry queries over these are oracle-checked end-to-end in
``test_entry_oracle.py``; here we pin the operator-level contracts and
edge cases the corpus queries don't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ifs_spark.operators.chunking import chunk_documents, pack_chunks
from spark_ifs_spark.operators.dedup import contaminated_ids
from spark_ifs_spark.operators.sampling import (
    SPLIT_BUCKETS,
    cap_per_key,
    split_assign,
    split_thresholds,
)
from spark_ifs_spark.operators.textstats import scrub_pii


# -- split_assign -----------------------------------------------------------

def test_split_thresholds_cut_points():
    cuts = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    assert cuts == [("train", 9000), ("val", 9500), ("test", SPLIT_BUCKETS)]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})  # doesn't sum to 1
    with pytest.raises(ValueError):
        split_thresholds({"a": 1.5, "b": -0.5})


def test_split_assign_deterministic_and_proportional(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(df, "doc_id", w, seed=7).groupBy("split").count().collect()
    b = split_assign(df, "doc_id", w, seed=7).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # stable across runs
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 5000 == pytest.approx(0.8, abs=0.03)
    assert counts["val"] / 5000 == pytest.approx(0.1, abs=0.02)
    # a different seed reassigns a substantial fraction of ids
    moved = (
        split_assign(df, "doc_id", w, seed=7)
        .select("doc_id", F.col("split").alias("s7"))
        .join(
            split_assign(df, "doc_id", w, seed=8).select(
                "doc_id", F.col("split").alias("s8")
            ),
            "doc_id",
        )
        .filter("s7 != s8")
        .count()
    )
    assert moved > 500


def test_split_assign_is_scan_fused(spark):
    from spark_ifs_spark.plans.checks import count_exchanges

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", {"train": 0.9, "test": 0.1})
    assert count_exchanges(out) == 0


# -- weighted_mix -----------------------------------------------------------

def test_weighted_mix_budget_and_determinism(spark):
    from spark_ifs_spark.operators.sampling import weighted_mix

    rows = [(i, "web" if i < 800 else "code", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # web: 80k chars, budget 20k → ~25% kept; code: 20k chars, budget
    # 50k > total → all 200 kept
    targets = {"web": 20_000, "code": 50_000}
    kept = weighted_mix(df, "doc_id", "source", "n_chars", targets, seed=3)
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["code"] == 200  # under budget: kept whole
    assert 120 <= counts["web"] <= 280  # ≈200 expected at rate 0.25
    again = weighted_mix(df, "doc_id", "source", "n_chars", targets, seed=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_weighted_mix_drops_unspecified_keys_and_is_broadcast(spark):
    from spark_ifs_spark.plans.checks import count_exchanges
    from spark_ifs_spark.operators.sampling import weighted_mix

    rows = [(i, "a" if i % 2 else "b", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = weighted_mix(df, "doc_id", "source", "n_chars", {"a": 1_000_000}, seed=1)
    assert {r["source"] for r in kept.collect()} == {"a"}
    # the corpus relation joins the per-key rates by broadcast: the only
    # exchange in the plan feeds the cardinality-bounded totals aggregate
    assert count_exchanges(kept) <= 2


# -- cap_per_key ------------------------------------------------------------

def test_cap_per_key_quota_and_order(spark):
    rows = [(f"src{i % 3}", i, 1000 - i) for i in range(60)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    out = cap_per_key(
        df, ["source"], "n_chars", cap=5, tiebreak_cols=["doc_id"]
    ).collect()
    per_key: dict[str, list] = {}
    for r in out:
        per_key.setdefault(r["source"], []).append((r["rank"], r["n_chars"]))
    for k, v in per_key.items():
        v.sort()
        assert len(v) == 5
        # descending n_chars within each key
        assert [x[1] for x in v] == sorted([x[1] for x in v], reverse=True)
    with pytest.raises(ValueError):
        cap_per_key(df, ["source"], "n_chars", cap=0)


# -- chunk_documents / pack_chunks ------------------------------------------

def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three tokens"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: stride 3 → starts 0,3,6,9 → windows of 4,4,4,1 tokens
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk"] == "t0 t1 t2 t3"
    assert c1[1]["chunk"] == "t3 t4 t5 t6"  # 1-token overlap
    assert c1[3]["chunk"] == "t9"
    # every token appears in at least one chunk
    covered = set()
    for r in c1:
        covered.update(r["chunk"].split(" "))
    assert covered == {f"t{i}" for i in range(10)}
    # short docs: single truncated chunk, no empties
    assert [(r["chunk_idx"], r["n_tokens"]) for r in by_doc[2]] == [(0, 3)]
    assert [(r["chunk_idx"], r["n_tokens"]) for r in by_doc[3]] == [(0, 1)]
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_chunk_documents_is_scan_fused(spark):
    from spark_ifs_spark.plans.checks import count_exchanges

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert count_exchanges(chunk_documents(docs, "doc_id", "text", 4, 1)) == 0


def test_pack_chunks_interval_contract(spark):
    rows = [("en", i, 0, 60) for i in range(10)]
    df = spark.createDataFrame(rows, "lang string, id long, chunk_idx int, n_tokens int")
    out = sorted(
        pack_chunks(df, ["lang"], "n_tokens", target_tokens=100).collect(),
        key=lambda r: r["id"],
    )
    # bin ids are non-decreasing along the pack order and start at 0
    bin_seq = [r["bin_id"] for r in out]
    assert bin_seq[0] == 0
    assert all(a <= b for a, b in zip(bin_seq, bin_seq[1:]))
    # exact interval assignment: floor(cum_before / target)
    cum = 0
    for r in out:
        assert r["bin_id"] == cum // 100
        cum += r["n_tokens"]
    # bound: no bin exceeds target + one max chunk
    bins: dict[int, int] = {}
    for r in out:
        bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(s < 100 + 60 for s in bins.values())
    # deterministic: same assignment on rerun
    again = pack_chunks(df, ["lang"], "n_tokens", target_tokens=100).collect()
    assert sorted((r["id"], r["bin_id"]) for r in out) == sorted(
        (r["id"], r["bin_id"]) for r in again
    )


# -- scrub_pii --------------------------------------------------------------

def test_scrub_pii_patterns(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.co.uk thanks"),
            (2, "card 1234567890123456 and pin 1234"),
            (3, "clean text with no pii at all"),
            (4, "two mails a@b.io c@d.org and run 999999999"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in scrub_pii(docs, "doc_id", "text").collect()}
    assert got[1]["clean_text"] == "mail me at <EMAIL> thanks"
    assert (got[1]["n_emails"], got[1]["n_long_nums"]) == (1, 0)
    assert got[2]["clean_text"] == "card <NUM> and pin 1234"  # short num kept
    assert (got[2]["n_emails"], got[2]["n_long_nums"]) == (0, 1)
    assert got[3]["clean_text"] == "clean text with no pii at all"
    assert got[4]["clean_text"] == "two mails <EMAIL> <EMAIL> and run <NUM>"
    assert (got[4]["n_emails"], got[4]["n_long_nums"]) == (2, 1)


# -- contaminated_ids -------------------------------------------------------

def test_contaminated_ids_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared"),
            (3, "xx quick brown fox jumps yy"),  # shares the 4-gram
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    got = sorted(
        r["id"] for r in contaminated_ids(corpus, eval_set, "doc_id", "text", n=4).collect()
    )
    assert got == [1, 3]
    # n larger than every doc → nothing flagged, no errors
    assert contaminated_ids(corpus, eval_set, "doc_id", "text", n=50).count() == 0


def test_sample_exact_n_stable_under_growth(spark, sf_dir):
    """Determinism + stability: same draw twice; and growing the corpus
    only displaces members whose hash rank falls past n — survivors of
    the grown draw that existed before must be exactly the old members
    that kept rank < n (membership is rank-monotone, never reshuffled)."""
    from spark_ifs_spark.operators.sampling import sample_exact_n

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter("doc_id % 2 = 0")
    s1 = {r["doc_id"] for r in sample_exact_n(half, "doc_id", 50).collect()}
    s2 = {r["doc_id"] for r in sample_exact_n(half, "doc_id", 50).collect()}
    assert s1 == s2

    grown = {r["doc_id"] for r in sample_exact_n(docs, "doc_id", 50).collect()}
    # old members still present in the grown draw = old members whose
    # global rank stayed < n; crucially no NEW even-id member appears
    # that wasn't in the half-corpus draw (ranks never improve)
    even_grown = {d for d in grown if d % 2 == 0}
    assert even_grown <= s1


def test_winsorize_bounds_and_row_preservation(spark, sf_dir):
    """Clipped values live in [p_lo, p_hi] of their key group; no rows
    are gained or lost by the broadcast-join plan."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.textstats import winsorize_by_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")
    w = winsorize_by_key(ev, "event_type", "value", 0.05, 0.95)
    assert w.count() == ev.count()
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    bad = (
        w.join(q, "event_type")
        .filter((F.col("value_clipped") < F.col("lo")) | (F.col("value_clipped") > F.col("hi")))
        .count()
    )
    assert bad == 0


def test_rollup_levels_are_consistent(spark, sf_dir):
    """ROLLUP invariants: each (type, NULL) subtotal equals the sum of
    its (type, day) rows, and the grand-total row equals the sum of the
    subtotals — one shuffle produced all three levels coherently."""
    from spark_ifs_spark.registry import q_events_rollup

    rows = q_events_rollup(spark, sf_dir).collect()
    days = {}
    subtotals = {}
    grand = None
    for r in rows:
        if r["event_type"] is None and r["day"] is None:
            grand = r["n"]
        elif r["day"] is None:
            subtotals[r["event_type"]] = r["n"]
        else:
            days[r["event_type"]] = days.get(r["event_type"], 0) + r["n"]
    assert days == subtotals
    assert grand == sum(subtotals.values())


def test_compact_latest_is_idempotent(spark, sf_dir):
    """Compacting a compacted table is the identity."""
    from spark_ifs_spark.operators.topk import compact_latest

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    once = compact_latest(ev, ["user_id"], "ts", ["event_id"])
    twice = compact_latest(once, ["user_id"], "ts", ["event_id"])
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b


def test_operators_tolerate_empty_input(spark):
    """Library surface on 0-row inputs: every operator must return an
    empty (or identity) result, never raise — an incremental pipeline's
    first run and quiet-period batches are empty inputs."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.chunking import chunk_documents, pack_chunks
    from spark_ifs_spark.operators.dedup import corpus_diff, exact_dedup, word_shingles
    from spark_ifs_spark.operators.sampling import sample_exact_n, weighted_mix
    from spark_ifs_spark.operators.textstats import (
        bigram_logprob,
        source_vocab_overlap,
        winsorize_by_key,
    )
    from spark_ifs_spark.operators.topk import compact_latest

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    assert word_shingles(docs, "doc_id", "text").count() == 0
    assert bigram_logprob(docs, "doc_id", "text").count() == 0
    assert source_vocab_overlap(docs, "source", "text").count() == 0
    # bare string for a Sequence[str] param must mean one column
    assert exact_dedup(docs, "doc_id", "text").count() == 0
    assert sample_exact_n(docs, "doc_id", 10).count() == 0
    assert weighted_mix(docs, "doc_id", "source", "n_chars", {"s": 100}).count() == 0
    assert compact_latest(docs, ["source"], "n_chars", ["doc_id"]).count() == 0
    assert winsorize_by_key(docs, "source", "n_chars").count() == 0
    ch = chunk_documents(docs, "doc_id", "text", 8, 2)
    assert ch.count() == 0
    assert pack_chunks(ch, ["id"], "n_tokens", 64).count() == 0
    fp = docs.select(F.col("doc_id").alias("id"), F.lit("x").alias("fp"))
    assert corpus_diff(fp, fp, "id", "fp").count() == 0


def test_weighted_sample_favors_heavy_weights(spark):
    from spark_ifs_spark.operators.sampling import weighted_sample_n

    # 5 heavy rows (w=10000) among 200 light rows (w=1): a 20-row draw
    # should include all heavy rows with overwhelming probability
    rows = [(i, 10000.0) for i in range(5)] + [(100 + i, 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    picked = {r["id"] for r in weighted_sample_n(df, "id", "w", 20, seed=3).collect()}
    assert set(range(5)) <= picked
    assert len(picked) == 20


def test_weighted_sample_deterministic_and_order_invariant(spark):
    from pyspark.sql import functions as F
    from spark_ifs_spark.operators.sampling import weighted_sample_n

    rows = [(i, float(1 + i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = sorted(r["id"] for r in weighted_sample_n(df, "id", "w", 10, seed=5).collect())
    shuffled = df.orderBy(F.rand(1)).repartition(7)
    b = sorted(r["id"] for r in weighted_sample_n(shuffled, "id", "w", 10, seed=5).collect())
    assert a == b


def test_cluster_aware_split_pure_python_replica(spark):
    """Third-implementation hand-pin: replicate the cluster-keyed split
    in PURE PYTHON (md5 bucket + cumulative cuts) on a fixture with a
    known near-dup cluster, and assert no cluster straddles splits."""
    from spark_ifs_spark.functions.hashing import md5_int60_py
    from spark_ifs_spark.operators.sampling import split_assign, split_thresholds

    # 3 docs in one cluster (same cluster label = min id), 3 singletons
    labeled = [(10, 10), (11, 10), (12, 10), (20, 20), (21, 21), (22, 22)]
    weights = {"train": 0.5, "val": 0.25, "test": 0.25}
    df = spark.createDataFrame(labeled, ["doc_id", "cluster"])
    got = {
        r["doc_id"]: r["split"]
        for r in split_assign(df, "cluster", weights, seed=7).collect()
    }
    cuts = split_thresholds(weights)

    def py_split(cluster):
        b = md5_int60_py(f"7:{cluster}") % 10_000
        for name, ub in cuts:
            if b < ub:
                return name
        raise AssertionError("bucket out of range")

    want = {d: py_split(c) for d, c in labeled}
    assert got == want
    # the whole cluster rides one split
    assert len({got[10], got[11], got[12]}) == 1


def test_negative_samples_invariants(spark):
    """Ring invariants: exactly k negatives per anchor, never itself,
    no duplicate (anchor, neg) pair, and every id appears as a negative
    exactly k times (the ring is a k-regular circulant)."""
    from collections import Counter

    from spark_ifs_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(17)], ["vec_id"])
    rows = negative_samples(df, "vec_id", k=4, seed=9).collect()
    per_anchor = Counter(r["id"] for r in rows)
    assert set(per_anchor.values()) == {4}
    assert all(r["id"] != r["neg_id"] for r in rows)
    assert len({(r["id"], r["neg_id"]) for r in rows}) == len(rows)
    as_neg = Counter(r["neg_id"] for r in rows)
    assert set(as_neg.values()) == {4}


def test_priority_sample_estimate_empty_input_one_row(spark):
    """Empty-input contract (round-9 ADVICE): the estimator is a GLOBAL
    aggregate, so an empty corpus yields exactly one row — n_rows 0,
    tau 0.0, NULL exact_total — not zero rows (the old groupBy('tau')
    shape vanished there while an ungrouped oracle aggregate did not)."""
    from spark_ifs_spark.operators.sampling import priority_sample_estimate

    df = spark.createDataFrame([], "doc_id long, w long")
    rows = priority_sample_estimate(df, "doc_id", "w", k=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rows"] == 0 and r["n_sample"] == 0
    assert r["tau"] == 0.0 and r["est_total"] == 0.0
    assert r["exact_total"] is None and r["err_ppm"] is None


def test_priority_sample_estimate_small_exact(spark):
    """With n <= k every row is kept, tau is 0, and the estimator sum
    IS the exact total (max(w, 0) = w) — the unbiasedness edge case."""
    from spark_ifs_spark.operators.sampling import priority_sample_estimate

    df = spark.createDataFrame(
        [(i, 10 + i) for i in range(5)], "doc_id long, w long"
    )
    r = priority_sample_estimate(df, "doc_id", "w", k=8).collect()[0]
    assert r["n_rows"] == 5 and r["n_sample"] == 5
    assert r["tau"] == 0.0
    assert r["est_total"] == float(r["exact_total"]) == 60.0
    assert r["err_ppm"] == 0


# -- hash_sample_quantiles ----------------------------------------------------

def test_hash_sample_quantiles_exhaustive_sample_is_exact(spark):
    # sample_mod=1 keeps every row, so the "estimate" is the exact
    # discrete quantile and the rank audit is tautologically tight:
    # n_le/n >= q by construction of rank ceil(q*n/100)
    from spark_ifs_spark.operators.sampling import hash_sample_quantiles

    rows = [(i, i * 10) for i in range(1, 101)]  # values 10..1000
    df = spark.createDataFrame(rows, ["id", "v"])
    out = hash_sample_quantiles(df, "id", "v", qs_pct=(25, 50, 99), sample_mod=1)
    got = {r["q_pct"]: r for r in out.collect()}
    assert got[25]["v_est"] == 250 and got[50]["v_est"] == 500
    assert got[99]["v_est"] == 990
    for q, r in got.items():
        assert r["n_sample"] == 100
        assert r["rank_ppm"] == q * 10_000
        assert r["err_ppm"] == 0


def test_hash_sample_quantiles_deterministic_and_order_invariant(spark):
    from spark_ifs_spark.operators.sampling import hash_sample_quantiles

    rows = [(i, (i * 37) % 1000) for i in range(500)]
    a = hash_sample_quantiles(
        spark.createDataFrame(rows, ["id", "v"]), "id", "v", sample_mod=10
    ).collect()
    b = hash_sample_quantiles(
        spark.createDataFrame(rows[::-1], ["id", "v"]).repartition(7), "id", "v",
        sample_mod=10,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # rank error of a 10% sample on 500 rows should be well under 10%
    for r in a:
        assert r["err_ppm"] <= 100_000


def test_hash_sample_quantiles_validates_args(spark):
    from spark_ifs_spark.operators.sampling import hash_sample_quantiles

    df = spark.createDataFrame([(1, 1)], ["id", "v"])
    with pytest.raises(ValueError):
        hash_sample_quantiles(df, "id", "v", sample_mod=0)
    with pytest.raises(ValueError):
        hash_sample_quantiles(df, "id", "v", qs_pct=())
    with pytest.raises(ValueError):
        hash_sample_quantiles(df, "id", "v", qs_pct=(0, 50))
