

def test_prefix_sum_two_level_matches_single_window(spark):
    """The bucketed two-level prefix sum equals the naive global-window
    cumsum — including across bucket boundaries, sparse/gappy ids, and
    zero values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.chunking import prefix_sum

    rows = [(i * 3 + (i % 5), (i * 7) % 11) for i in range(500)]  # gappy ids
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum_before"]
        for r in prefix_sum(df, "id", "v", bucket=64).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_packing_curve_regime_tradeoff(spark, sf_dir):
    """Packed utilization dominates single-sequence utilization at
    every context length, and the straddle count is bounded by the
    number of bin boundaries."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.chunking import packing_waste_curve

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    for r in packing_waste_curve(docs, "doc_id", "n_tok").collect():
        assert r["packed_util_ppm"] >= r["single_util_ppm"]
        assert r["straddled_docs"] <= r["packed_bins"]
        assert 0 < r["packed_util_ppm"] <= 1_000_000
