"""BPE trainer: fold-merge semantics vs the reference sequential
algorithm, and in-core vs distributed path agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ifs_spark.operators.bpe import (
    _merge_incore,
    bpe_train,
    merge_pair_expr,
)


def test_merge_pair_expr_matches_sequential_reference(spark):
    cases = [
        (["a", "a", "a"], "a", "a"),        # odd run: aa + a
        (["a", "a", "a", "a"], "a", "a"),   # even run: aa + aa
        (["x", "y", "x", "y"], "x", "y"),   # back-to-back pairs
        (["b", "x", "y", "y"], "x", "y"),   # merge then trailing y
        (["x"], "x", "y"),                  # too short
        (["y", "x"], "x", "y"),             # wrong order
        (["x", "y", "y", "x", "x", "y"], "x", "y"),
    ]
    for s, x, y in cases:
        got = (
            spark.createDataFrame([(s,)], "s array<string>")
            .select(merge_pair_expr(F.col("s"), x, y).alias("m"))
            .first()["m"]
        )
        assert got == _merge_incore(s, x, y), (s, x, y, got)


def test_bpe_train_tiny_corpus(spark):
    # "ab" x3, "abc" x2 -> pair (a,b) count 5 wins round 1; round 2
    # pairs: (ab,c) count 2
    df = spark.createDataFrame(
        [("ab ab abc",), ("ab abc",)], "text string"
    )
    rows = [
        (r["rank"], r["x"], r["y"], r["n"])
        for r in bpe_train(df, "text", 2).orderBy("rank").collect()
    ]
    assert rows == [(0, "a", "b", 5), (1, "ab", "c", 2)]


def test_bpe_paths_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    incore = [
        tuple(r)
        for r in bpe_train(docs, "text", 6).orderBy("rank").collect()
    ]
    dist = [
        tuple(r)
        for r in bpe_train(docs, "text", 6, incore_vocab_budget=0)
        .orderBy("rank")
        .collect()
    ]
    assert incore == dist
    assert len(incore) == 6
