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


def test_compact_latest_ties_and_payload(spark):
    """Deterministic winner under order-column ties (tiebreak decides),
    payload columns carried through unchanged."""
    from spark_ifs_spark.operators.topk import compact_latest

    rows = [
        (1, 10, 100, "a"),
        (1, 10, 101, "b"),   # same order value — higher tiebreak wins
        (1, 9, 999, "c"),
        (2, 5, 7, "d"),
    ]
    df = spark.createDataFrame(rows, "k int, o int, tb int, payload string")
    got = {
        r["k"]: (r["o"], r["tb"], r["payload"])
        for r in compact_latest(df, ["k"], "o", tiebreak_cols=["tb"]).collect()
    }
    assert got == {1: (10, 101, "b"), 2: (5, 7, "d")}


def test_compact_latest_equals_window_formulation(spark, sf_dir):
    """The aggregate form must select exactly the rows the window
    formulation selects (unique (order, tiebreak) per key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.topk import compact_latest

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    got = {
        r["user_id"]: r["event_id"]
        for r in compact_latest(ev, ["user_id"], "ts", ["event_id"]).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r["user_id"]: r["event_id"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want
