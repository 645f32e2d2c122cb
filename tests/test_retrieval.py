"""MaxSim late-interaction retrieval (operators/retrieval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ifs_spark.operators.retrieval import chunk_bow_vectors, maxsim_topk


def _vecs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return chunk_bow_vectors(df, "doc_id", "text", **kw)


def test_chunk_bow_norm_and_tf(spark):
    vecs = _vecs(
        spark, [(1, "a a b")], chunk_tokens=8, overlap=0, num_buckets=64
    ).collect()
    # one chunk, two buckets: tf 2 (a) and 1 (b); norm = sqrt(5) on both rows
    assert len(vecs) == 2
    assert sorted(r["tf"] for r in vecs) == [1, 2]
    assert all(abs(r["nrm"] - 5 ** 0.5) < 1e-12 for r in vecs)


def test_maxsim_is_max_over_chunks_sum_over_terms(spark):
    # doc 1: chunk0 = "a a a a", chunk1 = "b c d e" (chunk_tokens=4, overlap=0)
    # query [a, b]: maxsim(a) = 1.0 (pure-a chunk), maxsim(b) = 0.5 (tf 1 / norm 2)
    vecs = _vecs(
        spark, [(1, "a a a a b c d e")], chunk_tokens=4, overlap=0, num_buckets=4096
    )
    out = maxsim_topk(spark, vecs, {"q": ["a", "b"]}, k=5, num_buckets=4096).collect()
    assert len(out) == 1
    assert out[0]["rank"] == 1
    assert abs(out[0]["score"] - 1.5) < 1e-6


def test_maxsim_ranks_better_doc_first(spark):
    vecs = _vecs(
        spark,
        [(1, "x y z w"), (2, "a b x y"), (3, "p q r s")],
        chunk_tokens=4,
        overlap=0,
        num_buckets=4096,
    )
    out = maxsim_topk(spark, vecs, {"q": ["x", "y"]}, k=2, num_buckets=4096).collect()
    assert [(r["rank"], r["id"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 1), (2, 2),
    ]


def test_rrf_fuse_hand_computed(spark):
    from spark_ifs_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 10), ("q", 2, 20), ("q", 3, 30)], "query string, rank int, id long"
    )
    dense = spark.createDataFrame(
        [("q", 1, 20), ("q", 2, 10)], "query string, rank int, id long"
    )
    out = {r["id"]: (r["rank"], r["rrf_micro"]) for r in
           rrf_fuse([lex, dense], ["query"], "id", k=3, rrf_k=60).collect()}
    # doc 10: 1e6//61 + 1e6//62 = 16393 + 16129 = 32522
    # doc 20: 1e6//62 + 1e6//61 = 32522 (tie with 10 -> id asc: 10 first)
    # doc 30: 1e6//63 = 15873 (absent from dense leg: no penalty, just 0)
    assert out[10] == (1, 32522)
    assert out[20] == (2, 32522)
    assert out[30] == (3, 15873)


def test_rrf_fuse_respects_k(spark):
    from spark_ifs_spark.operators.retrieval import rrf_fuse

    lists = [
        spark.createDataFrame(
            [("a", r, 100 + r) for r in range(1, 6)], "query string, rank int, id long"
        ),
        spark.createDataFrame(
            [("b", r, 200 + r) for r in range(1, 6)], "query string, rank int, id long"
        ),
    ]
    out = rrf_fuse(lists, ["query"], "id", k=2, rrf_k=60)
    got = sorted((r["query"], r["rank"], r["id"]) for r in out.collect())
    assert got == [("a", 1, 101), ("a", 2, 102), ("b", 1, 201), ("b", 2, 202)]


def test_retrieval_eval_hand_computed(spark):
    """k=3, truth {1,2,3}; system ranks [2, 9, 1] -> hits at ranks 1 and
    3: recall 2/3, MRR 1/1, nDCG (w1+w3)/(w1+w2+w3)."""
    from spark_ifs_spark.operators.retrieval import dcg_weights_micro, retrieval_eval

    w = dcg_weights_micro(3)
    system = spark.createDataFrame(
        [("q", 1, 2), ("q", 2, 9), ("q", 3, 1)], "query string, rank int, id long"
    )
    truth = spark.createDataFrame(
        [("q", 1), ("q", 2), ("q", 3)], "query string, id long"
    )
    row = retrieval_eval(system, truth, ["query"], "id", k=3).collect()[0]
    assert row["n_truth"] == 3 and row["n_hits"] == 2
    assert row["recall_ppm"] == 666666
    assert row["mrr_micro"] == 1000000
    assert row["ndcg_micro"] == (w[0] + w[2]) * 1000000 // sum(w)


def test_retrieval_eval_missed_query_is_zero_row(spark):
    """A query whose system list has NO hits still appears, all-zero."""
    from spark_ifs_spark.operators.retrieval import retrieval_eval

    system = spark.createDataFrame(
        [("q", 1, 99)], "query string, rank int, id long"
    )
    truth = spark.createDataFrame([("q", 1), ("q", 2)], "query string, id long")
    row = retrieval_eval(system, truth, ["query"], "id", k=3).collect()[0]
    assert (row["n_hits"], row["recall_ppm"], row["mrr_micro"], row["ndcg_micro"]) == (
        0, 0, 0, 0,
    )


def test_retrieval_eval_perfect_ranking(spark):
    from spark_ifs_spark.operators.retrieval import retrieval_eval

    system = spark.createDataFrame(
        [("q", r, 100 + r) for r in range(1, 4)], "query string, rank int, id long"
    )
    truth = spark.createDataFrame(
        [("q", 100 + r) for r in range(1, 4)], "query string, id long"
    )
    row = retrieval_eval(system, truth, ["query"], "id", k=3).collect()[0]
    assert row["recall_ppm"] == 1000000
    assert row["mrr_micro"] == 1000000
    assert row["ndcg_micro"] == 1000000


def test_maxsim_query_join_is_broadcast(spark):
    vecs = _vecs(spark, [(1, "a b c")], chunk_tokens=4, overlap=0)
    plan = (
        maxsim_topk(spark, vecs, {"q": ["a"]}, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
