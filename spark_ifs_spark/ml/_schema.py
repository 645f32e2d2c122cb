"""Shared schema validation for the ML stages.

Replicates the observable ``transformSchema`` behavior of the reference
(``FeatureSelector.scala:101-109``, ``RowSelector.scala:144-153``): the
label/id column must be integral, the features column must be an ML vector
(we additionally accept ``array<numeric>`` — documented extension), and
the output column must not already exist. The reference then *casts* the
integral column to double inside ``fit`` (``FS:82``/``RS:118``); we do the
same.
"""

from __future__ import annotations

from pyspark.ml.linalg import VectorUDT
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DataType,
    IntegerType,
    LongType,
    NumericType,
    ShortType,
    StructType,
)

INTEGRAL_TYPES = (ByteType, ShortType, IntegerType, LongType)


def is_vector_type(dt: DataType) -> bool:
    return isinstance(dt, VectorUDT)


def is_array_features(dt: DataType) -> bool:
    return isinstance(dt, ArrayType) and isinstance(dt.elementType, NumericType)


def validate_schema(
    schema: StructType, integral_col: str, features_col: str, output_col: str
) -> None:
    if integral_col not in schema.names:
        raise ValueError(f"column {integral_col!r} not found")
    if features_col not in schema.names:
        raise ValueError(f"column {features_col!r} not found")
    dt = schema[integral_col].dataType
    if not isinstance(dt, INTEGRAL_TYPES):
        raise TypeError(
            f"column {integral_col!r} must be an integral type (Byte/Short/Int/Long), got {dt.simpleString()}"
        )
    fdt = schema[features_col].dataType
    if not (is_vector_type(fdt) or is_array_features(fdt)):
        raise TypeError(
            f"column {features_col!r} must be an ML Vector or array<numeric>, got {fdt.simpleString()}"
        )
    if output_col in schema.names:
        raise ValueError(f"output column {output_col!r} already exists")


def features_as_array(df, features_col: str):
    """Column expression turning the features column into array<double>.

    For sparse ML vectors this densifies — semantically exact for the
    engine: implicit zeros are real categorical ``0.0`` values
    (``extensions.scala:29``, ``MutualInformation.scala:49-51``).
    """
    dt = df.schema[features_col].dataType
    if is_vector_type(dt):
        from pyspark.ml.functions import vector_to_array

        return vector_to_array(F.col(features_col), dtype="float64")
    return F.transform(F.col(features_col), lambda x: x.cast("double"))


def _dense_to_sparse_cols(values):
    """(indices, values) of the nonzero entries of a dense array<double>,
    in ascending index order — pure JVM expressions, no Python."""
    nz = F.filter(
        F.zip_with(
            F.sequence(F.lit(0), F.size(values) - 1),
            values,
            lambda i, v: F.struct(i.alias("i"), v.alias("v")),
        ),
        lambda p: p["v"] != F.lit(0.0),
    )
    return F.transform(nz, lambda p: p["i"]), F.transform(nz, lambda p: p["v"])


def features_as_sparse(df, features_col: str):
    """``(n, indices, values)`` Column expressions giving the features
    column in sparse (sorted-indices, nonzero-values) form WITHOUT ever
    materializing a dense array for sparse ML vectors.

    Sparse ``VectorUDT`` rows pass their stored layout straight through
    via ``unwrap_udt`` (type=0: size/indices/values); dense rows (type=1,
    or ``array<numeric>`` input) are converted with a JVM filter over
    positions. Implicit zeros remain real categorical ``0.0`` values —
    the counting kernel (:func:`~spark_ifs_spark.operators.scores.mi_vec_sparse`)
    restores the ``(0, 0)`` cell by complement, the reference's
    nonzero-walk (``MutualInformation.scala:30-52``).
    """
    dt = df.schema[features_col].dataType
    if is_vector_type(dt):
        u = F.unwrap_udt(F.col(features_col))
        is_sparse = u["type"] == 0
        dense_idx, dense_val = _dense_to_sparse_cols(u["values"])
        n = F.when(is_sparse, u["size"]).otherwise(F.size(u["values"]))
        # stored sparse values may include explicit zeros; drop them so
        # both layouts normalize to the same strictly-nonzero form
        stored = F.filter(
            F.zip_with(
                u["indices"],
                u["values"],
                lambda i, v: F.struct(i.alias("i"), v.alias("v")),
            ),
            lambda p: p["v"] != F.lit(0.0),
        )
        idx = F.when(is_sparse, F.transform(stored, lambda p: p["i"])).otherwise(dense_idx)
        val = F.when(is_sparse, F.transform(stored, lambda p: p["v"])).otherwise(dense_val)
        return n, idx, val
    arr = F.transform(F.col(features_col), lambda x: x.cast("double"))
    idx, val = _dense_to_sparse_cols(arr)
    return F.size(arr), idx, val
