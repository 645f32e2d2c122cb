"""spark_ifs_spark — a PySpark-native Iterative Feature Selection engine.

A from-scratch rebuild of the capabilities of ``jacopocav/spark-ifs``
(greedy forward mRMR feature selection scored by mutual information on
categorical data, reference at /root/reference), re-expressed Spark-first:

- everything is DataFrame/Catalyst (the reference drops to RDDs at
  ``FeatureSelector.scala:82``; we never do),
- contingency tables are never materialized as driver matrices — joint
  counts stay distributed (``groupBy().count()``) and MI/mRMR are SQL
  aggregates over them,
- the only driver-side state is the greedy selection list (≤ k entries).

Plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming aggregation) the
reference never had.
"""

from spark_ifs_spark.operators.select_columns import all_pairs_mi, select_columns
from spark_ifs_spark.operators.select_rows import select_rows, select_rows_sparse
from spark_ifs_spark.operators.sampling import cap_per_key, split_assign
from spark_ifs_spark.operators.chunking import chunk_documents, pack_chunks
from spark_ifs_spark.operators.dedup import contaminated_ids
from spark_ifs_spark.operators.textstats import scrub_pii, tfidf_top_terms
from spark_ifs_spark.operators.scores import (
    ColumnScore,
    MiqColumnScore,
    MiqRowScore,
    MrmrColumnScore,
    MrmrRowScore,
    RowScore,
)
from spark_ifs_spark.ml.feature_selector import FeatureSelector, FeatureSelectorModel
from spark_ifs_spark.ml.row_selector import RowSelector, RowSelectorModel

__version__ = "0.1.0"

__all__ = [
    "all_pairs_mi",
    "select_columns",
    "select_rows",
    "select_rows_sparse",
    "split_assign",
    "cap_per_key",
    "chunk_documents",
    "pack_chunks",
    "contaminated_ids",
    "scrub_pii",
    "tfidf_top_terms",
    "ColumnScore",
    "RowScore",
    "MrmrColumnScore",
    "MrmrRowScore",
    "MiqColumnScore",
    "MiqRowScore",
    "FeatureSelector",
    "FeatureSelectorModel",
    "RowSelector",
    "RowSelectorModel",
]
