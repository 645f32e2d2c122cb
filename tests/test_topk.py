"""Skew-safe top-k: the salted two-stage plan must equal the single-stage
window under a total order, including on a deliberately skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ifs_spark.operators.topk import salted_topk_per_key, topk_per_key


def _rows(df):
    return sorted(
        (r["event_type"], r["rank"], r["event_id"]) for r in df.collect()
    )


def test_salted_equals_single_stage(spark, sf_dir):
    from spark_ifs_spark.sources.parquet import load_events

    ev = load_events(spark, sf_dir)
    a = salted_topk_per_key(ev, ["event_type"], "value", k=5, tiebreak_cols=["event_id"], buckets=8)
    b = topk_per_key(ev, ["event_type"], "value", k=5, tiebreak_cols=["event_id"])
    assert _rows(a) == _rows(b)
    assert len(_rows(a)) > 0


def test_salted_topk_on_skewed_key(spark):
    # one key holds 90% of rows; per-key results must still be exact
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("event_type"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    a = salted_topk_per_key(df, ["event_type"], "value", k=4, tiebreak_cols=["event_id"], buckets=4)
    b = topk_per_key(df, ["event_type"], "value", k=4, tiebreak_cols=["event_id"])
    assert _rows(a) == _rows(b)
    got = {r["event_type"] for r in a.collect()}
    assert got == {"hot", "cold"}
