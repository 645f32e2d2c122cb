

def test_readability_is_scan_fused(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.textstats import readability_scores
    from spark_ifs_spark.plans import assert_no_exchange

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_no_exchange(
        readability_scores(docs, "doc_id", "text"), "readability_scores"
    )


def test_readability_known_values(spark):
    """Hand-checked Flesch on a two-sentence doc: 6 words, 2 sentences,
    9 syllables (cae-sar 2, sa-lad 2, is 1, tas-ty 2, well 1, yes 1)."""
    from spark_ifs_spark.operators.textstats import readability_scores

    df = spark.createDataFrame(
        [(1, "caesar salad is tasty. well yes.")], "id long, t string"
    )
    r = readability_scores(df, "id", "t").collect()[0]
    assert (r["n_words"], r["n_sentences"]) == (6, 2)
    assert r["n_syllables"] == 9
    wps, spw = 6 / 2, 9 / 6
    assert abs(r["flesch"] - round(206.835 - 1.015 * wps - 84.6 * spw, 6)) < 1e-9


def test_heaps_beta_separates_growing_from_saturated_vocab(spark, sf_dir):
    """The fit recovers the two regimes: a corpus whose every doc brings
    fresh words fits β ≈ 1; a fixed-vocabulary corpus (like the
    synthetic documents table, whose ~40-word vocabulary saturates in
    the first prefix) fits β ≈ 0. Curve monotone, fit columns constant."""
    from spark_ifs_spark.operators.textstats import heaps_law_fit

    fresh = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{k}" for k in range(10))) for i in range(64)],
        "doc_id long, text string",
    )
    rows = sorted(
        heaps_law_fit(fresh, "doc_id", "text").collect(), key=lambda r: r["j"]
    )
    assert len(rows) == 8
    assert len({r["beta_ppm"] for r in rows}) == 1
    assert rows[0]["beta_ppm"] > 900_000  # linear growth -> beta ~ 1
    for a, b in zip(rows, rows[1:]):
        assert a["n_tokens"] <= b["n_tokens"] and a["vocab"] <= b["vocab"]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sat = heaps_law_fit(docs, "doc_id", "text").collect()[0]
    assert 0 <= sat["beta_ppm"] < 100_000  # saturated vocabulary -> beta ~ 0


def test_quality_sweep_retention_is_cumulative(spark, sf_dir):
    from spark_ifs_spark.operators.textstats import quality_threshold_sweep

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        quality_threshold_sweep(docs, "doc_id", "text").collect(),
        key=lambda r: -r["bin"],
    )
    run_docs = run_toks = 0
    for r in rows:  # descending bins: retained = running totals
        run_docs += r["n_docs"]
        run_toks += r["n_tokens"]
        assert (r["docs_retained"], r["tokens_retained"]) == (run_docs, run_toks)
    assert rows[-1]["retained_ppm"] == 1_000_000
