"""Selection-operator invariants (coverage_select greedy)."""
def test_coverage_select_greedy_invariants(spark, sf_dir):
    """Submodular greedy: winners are distinct, marginal gains are
    non-increasing, and each round's gain equals the winner's
    uncovered-bigram count recomputed from scratch."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.dedup import word_shingles
    from spark_ifs_spark.operators.selection import coverage_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    rows = coverage_select(docs, "doc_id", "text", k=4, n=2).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    gains = [r["new_terms"] for r in rows]
    assert gains == sorted(gains, reverse=True) and all(g > 0 for g in gains)
    # recompute each round's marginal gain independently
    sh = {
        i: set()
        for i in ids
    }
    for r in word_shingles(docs, "doc_id", "text", 2).collect():
        if r["id"] in sh:
            sh[r["id"]].add(r["sh"])
    covered: set = set()
    for row in rows:
        assert row["new_terms"] == len(sh[row["doc_id"]] - covered)
        covered |= sh[row["doc_id"]]
