"""ORC and raw-text corpus sources/sinks.

Rounds out the interchange surface beyond parquet/CSV/JSONL:

- **ORC** — the other columnar format real lakes hold (Hive-era
  estates are ORC); Spark's reader gives the same predicate pushdown /
  column pruning as parquet, so a pipeline can process ORC in place
  instead of paying a full rewrite first. Same explicit-schema
  discipline as the JSONL reader.
- **raw text** — one document per line (``spark.read.text``), the
  lowest-common-denominator crawl dump shape. Each row is tagged with
  its source file (``input_file_name``) and a deterministic 60-bit md5
  doc id over (file, line text) so downstream dedup/split operators get
  the stable id they key on. No monotonically_increasing_id: that id is
  partition-layout-dependent and changes on re-read — the md5 id is
  reproducible across runs, engines, and cluster sizes, the same
  property every sampler in this repo builds on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ifs_spark.functions.hashing import md5_int60


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC scan; pass a DDL ``schema`` to skip footer-sampling inference
    on wide estates (ORC stores types, but pinning the schema guards
    against shard drift exactly like the JSONL reader)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """``(doc_id, text, src_file)`` from line-oriented raw text dumps.

    ``doc_id`` is md5-derived from (file, text): stable under re-reads
    and cluster-size changes. Identical lines in the same file collide
    by design — they are the same document to every dedup operator
    downstream, so assigning them distinct ids would only defer the
    exact-dedup the pipeline runs anyway.
    """
    raw = spark.read.text(path)
    src = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return raw.select(
        md5_int60(F.concat(src, F.lit(":"), F.col("value"))).alias("doc_id"),
        F.col("value").alias("text"),
        src.alias("src_file"),
    )
