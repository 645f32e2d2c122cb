"""Streaming parity: the same transform body must produce identical
results through spark.readStream (file source → memory sink, one
micro-batch) as through the batch reader."""

from __future__ import annotations

import shutil

import pytest

from spark_ifs_spark.sources.parquet import load_events
from spark_ifs_spark.streaming.events import sessionize, windowed_event_counts


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    # file-source streaming needs a directory; ns-timestamps need the
    # nanosAsLong conf already set by load_events
    d = tmp_path_factory.mktemp("events_stream")
    batch = load_events(spark, sf_dir)
    batch.write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events"), batch


def _run_stream(spark, path, schema, transform, name):
    stream = spark.readStream.schema(schema).parquet(path)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_equals_batch(spark, events_stream_dir):
    path, batch = events_stream_dir
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_counts(batch).collect()
    }
    got_df = _run_stream(
        spark, path, batch.schema, lambda df: windowed_event_counts(df), "win_counts"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in got_df.collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_equals_batch(spark, events_stream_dir):
    path, batch = events_stream_dir
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessionize(batch).collect()
    }
    got_df = _run_stream(spark, path, batch.schema, lambda df: sessionize(df), "sessions")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in got_df.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_user_stats_multi_batch(spark, sf_dir):
    """applyInPandasWithState must fold state ACROSS micro-batches: with a
    2-file source and maxFilesPerTrigger=1, a user seen in both batches
    gets two update rows whose final state equals the batch aggregate."""
    from spark_ifs_spark.registry import q_events_user_stats
    from spark_ifs_spark.sources.parquet import load_events

    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in q_events_user_stats(spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_dedup_events_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming dropDuplicatesWithinWatermark over a doubled input must
    recover exactly the batch-distinct row set."""
    from spark_ifs_spark.sources.parquet import load_events
    from spark_ifs_spark.streaming.events import dedup_events

    batch = load_events(spark, sf_dir)
    doubled = batch.union(batch)
    path = str(tmp_path / "doubled")
    doubled.write.mode("overwrite").parquet(path)

    want = dedup_events(doubled).count()
    assert want == batch.count()

    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = dedup_events(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_ev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("SELECT count(DISTINCT event_id) AS n, count(*) AS total FROM dedup_ev").first()
    assert got["total"] == want
    assert got["n"] == want


def test_streaming_parquet_sink_day_partitioned(spark, sf_dir, tmp_path):
    """writeStream -> day-partitioned parquet: files land under day=...,
    read-back equals the batch input, and a day filter partition-prunes."""
    import os

    from spark_ifs_spark.plans import explain_str
    from spark_ifs_spark.sources.parquet import load_events
    from spark_ifs_spark.streaming.events import write_events_stream

    batch = load_events(spark, sf_dir)
    src = str(tmp_path / "src")
    batch.write.mode("overwrite").parquet(src)
    out, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = write_events_stream(stream, out, ckpt)
    q.awaitTermination(120)
    assert any(d.startswith("day=") for d in os.listdir(out))

    back = spark.read.parquet(out)
    assert back.count() == batch.count()
    pruned = back.filter(back["day"] == back.select("day").first()["day"])
    assert "PartitionFilters" in explain_str(pruned)


def test_stream_static_enrichment_join(spark, sf_dir, tmp_path):
    """Stream-static join enriches every event without stream state;
    stream result == batch result."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.sources.parquet import load_events
    from spark_ifs_spark.streaming.events import join_events_to_user_profile

    batch = load_events(spark, sf_dir)
    profiles = batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_n_events"))
    want = join_events_to_user_profile(batch, profiles).filter(
        F.col("user_n_events").isNotNull()
    ).count()
    assert want == batch.count()

    src = str(tmp_path / "src2")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = join_events_to_user_profile(stream, profiles)
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_ev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n FROM enriched_ev WHERE user_n_events IS NOT NULL"
    ).first()["n"]
    assert got == want
