"""Parquet table loading, including the ns-timestamp quirk.

The driver's ``events`` table stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects outright
(``PARQUET_TYPE_ILLEGAL``). The supported escape hatch is
``spark.sql.legacy.parquet.nanosAsLong`` (runtime conf): nanos arrive as a
``long`` we convert to a microsecond timestamp. The testdata is µs-grain
(verified: all ns remainders are zero), so the conversion is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (path, file-mtime) -> number of scan splits Spark gives the file,
#: memoized so the fan-out decision costs one physical-planning pass per
#: table per process (metadata only — never rows or results); keyed on
#: mtime like the registry staging caches, so a table rewritten in-place
#: during a session re-probes instead of keeping a stale split count
_SCAN_SPLITS: dict[tuple[str, float], int] = {}


def fan_out(df: DataFrame, path: str | None = None) -> DataFrame:
    """Scale-adaptive scan rebalance (optimization guide §2.3): when the
    source yields fewer scan splits than the session has cores, add ONE
    round-robin repartition to core count so downstream map-heavy work
    (shingle hashing, fingerprint decode, scoring) uses the whole
    machine instead of a single task.

    The local gate fixtures are single-row-group parquet files — one
    scan task regardless of ``maxPartitionBytes``, so CPU-heavy
    pipelines were serialized on one core out of N. At production scale
    inputs arrive pre-split (many files / many row groups), the
    condition is false, and this function is an identity: NO exchange
    is added. The split count is read from the plan
    (``df.rdd.getNumPartitions()``, planning only, no job) and memoized
    per path. Set ``SPARK_GRAFT_FANOUT=off`` to disable.

    OPT-IN per read site (``load_table(..., fan_out=True)``), never a
    blanket: the exchange pays for itself only when the downstream work
    is per-row expensive (measured 3–4.5x on winnowing, substring
    shingling, Poisson bootstrap, k-means assignment). Applying it to
    every read cost more than it saved — cheap scan-aggregate queries
    paid a full-table shuffle for parallelism they did not need, and
    the accumulated extra exchanges degraded long shared sessions
    (measured +145 s across a 246-query bench run).
    """
    if os.environ.get("SPARK_GRAFT_FANOUT", "auto") == "off":
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    key = None
    if path is not None:
        try:
            key = (path, os.path.getmtime(path))
        except OSError:
            key = None
    splits = _SCAN_SPLITS.get(key) if key is not None else None
    if splits is None:
        splits = df.rdd.getNumPartitions()
        if key is not None:
            _SCAN_SPLITS[key] = splits
    if splits * 2 <= cores:
        return df.repartition(cores)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out_scan: bool = False
) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir, fan_out_scan=fan_out_scan)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    return fan_out(df, path) if fan_out_scan else df


def load_events(
    spark: SparkSession, sf_dir: str, fan_out_scan: bool = False
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        # integer division: ns values (~1.7e18) exceed double's exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return fan_out(df, path) if fan_out_scan else df
