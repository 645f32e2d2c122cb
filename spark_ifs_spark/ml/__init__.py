"""Spark ML Estimator/Model surface (parity with the reference's
``FeatureSelector``/``RowSelector`` pipeline stages)."""

from spark_ifs_spark.ml.bpe_tokenizer import BpeTokenizer, BpeTokenizerModel
from spark_ifs_spark.ml.feature_selector import FeatureSelector, FeatureSelectorModel
from spark_ifs_spark.ml.row_selector import RowSelector, RowSelectorModel

__all__ = [
    "BpeTokenizer",
    "BpeTokenizerModel",
    "FeatureSelector",
    "FeatureSelectorModel",
    "RowSelector",
    "RowSelectorModel",
]
