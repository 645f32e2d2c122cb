"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()``/``oracle_sql()``
expose every implemented operator (SURVEY.md §2 + the LLM-data-pipeline
extensions) for the driver's side-by-side DuckDB comparison. All
implementations live in the ``spark_ifs_spark`` package; see
``spark_ifs_spark/registry.py`` for the cross-engine determinism
conventions (rounding, portable hashing, exact quantization).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ifs_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: greedy mRMR top-5 feature selection (conventional
    encoding) over the quantized ``embeddings`` table at sf0.001 — the
    engine's core capability end-to-end (melt → pair counting → MI →
    mRMR → argmax loop)."""
    return QUERIES["mrmr_select_k5"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
