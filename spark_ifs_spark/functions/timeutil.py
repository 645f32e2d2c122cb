"""Timestamp-type-portable epoch helpers.

Parquet timestamps written without UTC adjustment (``timestamp[us]`` in
Arrow) are read by Spark 4 as ``TIMESTAMP_NTZ`` when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is on (the default),
and as ``TIMESTAMP`` (LTZ) otherwise. ``F.unix_micros`` only accepts
the LTZ type, so every epoch extraction in the engine goes through
:func:`epoch_us`, which picks a type-correct expression from the
DataFrame schema:

- ``TIMESTAMP`` → ``unix_micros(col)`` (absolute instant).
- ``TIMESTAMP_NTZ`` → ``timestampdiff(MICROSECOND, NTZ epoch, col)``:
  pure wall-clock arithmetic, independent of the session time zone —
  exactly DuckDB's ``epoch_us`` on a naive timestamp, which is what the
  oracle comparisons assume.

Casting NTZ→LTZ and then calling ``unix_micros`` would instead shift
results by the *session* time zone — correct only when the session is
pinned to UTC, which a host-provided SparkSession may not be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_us(df: DataFrame, col: str) -> Column:
    """Microseconds since the epoch for a timestamp column of either
    ``TIMESTAMP`` or ``TIMESTAMP_NTZ`` type (see module docstring).

    ``col`` must be a plain column name present in ``df.schema``.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})")
    return F.unix_micros(F.col(col))


def ensure_event_time(df: DataFrame, col: str) -> DataFrame:
    """Casts a ``TIMESTAMP_NTZ`` column to ``TIMESTAMP`` so it can carry
    a watermark — Structured Streaming's event-time machinery accepts
    only the LTZ type (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``
    otherwise). No-op on LTZ input, and never applied on batch paths:
    the NTZ→LTZ cast interprets wall-clock values in the SESSION time
    zone (``session.get_spark`` pins UTC; a host session may not), so
    batch/oracle arithmetic stays on the tz-independent NTZ branch of
    :func:`epoch_us` and only streaming inputs — where the watermark
    forces the cast — take it. Differences (gaps, windows rendered back
    in the same session tz) are tz-invariant either way.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
