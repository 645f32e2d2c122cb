"""JSONL document corpus source/sink.

Training corpora interchange as newline-delimited JSON (one document
object per line — the Common Crawl / RedPajama / Dolma convention), so
the engine can ingest and emit that shape losslessly alongside parquet.

Scale discipline:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one — at 100 TB
  that doubles the scan, and a drifting field in shard 40,000 silently
  changes every column's type. Callers pass (or reuse) a DDL schema;
  the documents-table default is provided.
- **PERMISSIVE + corrupt-record capture.** A bad line lands in
  ``_corrupt_record`` instead of killing the job (one mangled crawl
  line must not fail a 10^6-task ingest). The reader surfaces the
  corrupt column so pipelines can count/quarantine; ``strict=True``
  flips to FAILFAST for gated ingests.
- JSONL is a row format with no column pruning or predicate pushdown —
  the sink exists for interchange, parquet remains the processing
  format (the ingest job's first step should be exactly
  ``read_jsonl(...).write.parquet(...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: DDL for the synthetic ``documents`` table (TESTDATA.md)
DOCUMENTS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    strict: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    Returns the schema's columns plus ``_corrupt_record`` (null for
    clean rows) unless ``strict``, which raises on the first bad line.
    """
    mode = "FAILFAST" if strict else "PERMISSIVE"
    full = schema + (", _corrupt_record string" if not strict else "")
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write a DataFrame as (optionally gzipped) JSONL shards — one
    object per line, one file per partition; repartition upstream to
    control shard count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
