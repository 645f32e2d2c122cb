"""Parquet table loading, including the ns-timestamp quirk.

The driver's ``events`` table stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects outright
(``PARQUET_TYPE_ILLEGAL``). The supported escape hatch is
``spark.sql.legacy.parquet.nanosAsLong`` (runtime conf): nanos arrive as a
``long`` we convert to a microsecond timestamp. The testdata is µs-grain
(verified: all ns remainders are zero), so the conversion is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        # integer division: ns values (~1.7e18) exceed double's exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
