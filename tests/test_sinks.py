"""Layout-aware sink tests: the write-side 100 TB claims, plan-verified.

- IVF-partitioned corpus: a probe read must show PartitionFilters on the
  cell column (partition pruning) and return exactly the probed cells.
- Bucketed tables: a join on the bucket key must plan with NO Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ifs_spark.plans import count_exchanges, explain_str
from spark_ifs_spark.sources.sinks import read_table, write_bucketed, write_ivf_corpus


def test_ivf_corpus_partition_pruning(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_corpus")
    cents = write_ivf_corpus(emb, "vec_id", "embedding", path, num_centroids=8)
    assert len(cents) == 8

    corpus = spark.read.parquet(path)
    assert corpus.count() == emb.count()  # every vector in exactly one cell

    probe = corpus.filter(F.col("cell").isin(1, 2))
    plan = explain_str(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    cells_read = {r["cell"] for r in probe.select("cell").distinct().collect()}
    assert cells_read <= {1, 2}


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        left = emb.select("vec_id", "label")
        right = emb.select("vec_id", F.size("embedding").alias("dim"))
        write_bucketed(left, "b_left", ["vec_id"], num_buckets=8, sort_cols=["vec_id"])
        write_bucketed(right, "b_right", ["vec_id"], num_buckets=8, sort_cols=["vec_id"])
        joined = read_table(spark, "b_left").join(read_table(spark, "b_right"), "vec_id")
        n_ex = count_exchanges(joined)
        assert n_ex == 0, f"bucketed join planned {n_ex} shuffles:\n{explain_str(joined, 'simple')}"
        assert joined.count() == emb.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
