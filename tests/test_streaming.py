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
