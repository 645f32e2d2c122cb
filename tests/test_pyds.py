"""Custom Python DataSource: registration, partition-parallel reads,
determinism, and option handling."""

from __future__ import annotations


def _register(spark):
    from spark_ifs_spark.sources.pyds import SyntheticDocsSource

    spark.dataSource.register(SyntheticDocsSource)


def test_pyds_reads_partition_parallel(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 200)
        .option("shards", 4)
        .option("seed", 7)
        .load()
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    assert df.select("doc_id").distinct().count() == 200
    assert set(df.columns) == {"doc_id", "text", "lang", "n_chars"}


def test_pyds_is_deterministic(spark):
    _register(spark)

    def load():
        return (
            spark.read.format("synthetic_docs")
            .option("rows", 100)
            .option("shards", 3)
            .option("seed", 11)
            .load()
        )

    a = sorted(tuple(r) for r in load().collect())
    b = sorted(tuple(r) for r in load().collect())
    assert a == b

    other = (
        spark.read.format("synthetic_docs")
        .option("rows", 100)
        .option("shards", 3)
        .option("seed", 12)
        .load()
    )
    c = sorted(tuple(r) for r in other.collect())
    assert a != c  # seed actually steers the data


def test_pyds_composes_with_engine_operators(spark):
    """The source feeds ordinary engine operators like any table."""
    from spark_ifs_spark.operators.textstats import token_counts

    _register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 50)
        .option("shards", 2)
        .load()
    )
    out = token_counts(df, "doc_id", "text")
    assert out.count() == 50
    assert out.filter("n_ws_tokens < 3").count() == 0
