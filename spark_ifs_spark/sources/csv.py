"""CSV sources matching the reference CLI's ingest.

- conventional: headerless CSV, schema inferred, first column is the label
  (``/root/reference/src/main/scala/ifs/examples/CommandLine.scala:83-85``)
- alternate: headerless CSV + generated unique row id
  (``CommandLine.scala:113-115``)
- labels: one-line CSV read driver-side — it is a tiny side input
  (``CommandLine.scala:119-124``)

Scale note: ``inferSchema`` double-scans the file; acceptable for the CLI
parity surface. The library path takes explicit schemas / parquet.
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_conventional_csv(spark: SparkSession, path: str) -> tuple[DataFrame, list[str]]:
    """Headerless CSV → (df with ``label`` + feature columns, feature col names)."""
    df = spark.read.option("inferSchema", "true").csv(path)
    df = df.withColumnRenamed(df.columns[0], "label")
    return df, df.columns[1:]


def read_alternate_csv(spark: SparkSession, path: str) -> tuple[DataFrame, list[str]]:
    """Headerless CSV → (df with unique ``id`` + instance columns, instance cols).

    ``monotonically_increasing_id`` gives ids unique across partitions
    without any coordination (same recipe the reference documents at
    ``RowSelector.scala:22,53``); they are NOT consecutive on multi-
    partition input, which the selection semantics never require.
    """
    df = spark.read.option("inferSchema", "true").csv(path)
    cols = df.columns
    return df.withColumn("id", F.monotonically_increasing_id()), cols


def read_labels_csv(path: str) -> list[float]:
    """One-line labels CSV, read on the driver and meant to be broadcast."""
    with open(path, newline="") as f:
        row = next(csv.reader(f))
    return [float(x) for x in row]
