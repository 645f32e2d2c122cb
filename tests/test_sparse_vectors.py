"""Sparse-vector semantics parity (SURVEY §1.2, MutualInformation.scala:49-51,
extensions.scala:29): implicit zeros of sparse ML vectors are REAL
categorical 0.0 values. Densifying at the API edge must therefore give
results identical to an explicitly dense encoding."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.linalg import SparseVector, Vectors

from spark_ifs_spark.ml import FeatureSelector, RowSelector
from spark_ifs_spark.operators.scores import mi_vec


def test_mi_vec_sparse_zero_cell():
    # vectors with many implicit zeros: the (0,0) cell must count
    a = np.array([0, 0, 0, 0, 1, 2], dtype=float)
    b = np.array([0, 0, 0, 0, 1, 2], dtype=float)
    # MI(x,x) = H(x); zeros dominate → H < ln(3)
    h = mi_vec(a, b)
    p = np.array([4 / 6, 1 / 6, 1 / 6])
    assert h == pytest.approx(float(-(p * np.log(p)).sum()), abs=1e-12)


def test_mi_vec_sparse_identical_to_dense_high_dim():
    """The O(nnz) nonzero-walk kernel must be BIT-identical to the dense
    kernel on high-dimension genuinely-sparse rows (1% density, n=200k):
    same category tables, same cell order, same float reduction."""
    from spark_ifs_spark.operators.scores import mi_vec_sparse

    rng = np.random.default_rng(7)
    n = 200_000
    for trial in range(5):
        nnz_a = rng.choice(n, size=n // 100, replace=False)
        nnz_b = rng.choice(n, size=n // 100, replace=False)
        a = np.zeros(n)
        b = np.zeros(n)
        a[nnz_a] = rng.choice([1.0, 2.0, 3.0, -1.0], size=nnz_a.size)
        b[nnz_b] = rng.choice([1.0, 2.0, -2.0], size=nnz_b.size)
        dense = mi_vec(a, b)
        ia = np.sort(nnz_a)
        ib = np.sort(nnz_b)
        sparse = mi_vec_sparse(n, ia, a[ia], ib, b[ib])
        assert sparse == dense, f"trial {trial}: {sparse} != {dense}"


def test_mi_vec_sparse_edge_cases():
    from spark_ifs_spark.operators.scores import mi_vec_sparse

    # empty vectors (all-implicit): MI of constants is 0
    assert mi_vec_sparse(10, [], [], [], []) == 0.0
    assert mi_vec_sparse(0, [], [], [], []) == 0.0
    # fully dense inputs through the sparse kernel
    a = np.array([1.0, 2.0, 1.0, 2.0])
    b = np.array([1.0, 1.0, 2.0, 2.0])
    idx = np.arange(4)
    assert mi_vec_sparse(4, idx, a, idx, b) == mi_vec(a, b)
    # perfectly dependent sparse pair: MI == entropy
    n = 1000
    ia = np.arange(0, n, 10)
    va = np.ones(ia.size)
    assert mi_vec_sparse(n, ia, va, ia, va) == mi_vec(
        np.isin(np.arange(n), ia).astype(float),
        np.isin(np.arange(n), ia).astype(float),
    )


def test_feature_selector_sparse_equals_dense(spark):
    rng = np.random.default_rng(17)
    n, d = 150, 8
    # mostly-zero categorical matrix (sparse-friendly)
    X = rng.choice([0, 0, 0, 1, 2], size=(n, d)).astype(float)
    y = X[:, 3].astype(int)  # feature 3 fully determines the label
    dense_rows = [(int(y[i]), Vectors.dense(X[i])) for i in range(n)]
    sparse_rows = [
        (
            int(y[i]),
            SparseVector(d, {j: X[i, j] for j in range(d) if X[i, j] != 0.0}),
        )
        for i in range(n)
    ]
    dense_df = spark.createDataFrame(dense_rows, ["label", "features"])
    sparse_df = spark.createDataFrame(sparse_rows, ["label", "features"])
    m_dense = FeatureSelector(numTopFeatures=3, outputCol="out").fit(dense_df)
    m_sparse = FeatureSelector(numTopFeatures=3, outputCol="out").fit(sparse_df)
    assert m_dense.getSelectedFeatures() == m_sparse.getSelectedFeatures()
    assert m_dense.getSelectedFeatures()[0] == 3


def test_row_selector_sparse_equals_dense(spark):
    rng = np.random.default_rng(23)
    n_feat, n_inst = 6, 80
    M = rng.choice([0, 0, 1, 2], size=(n_feat, n_inst)).astype(float)
    labels = M[2].tolist()  # feature-row 2 matches the label exactly
    dense = spark.createDataFrame(
        [(j, Vectors.dense(M[j])) for j in range(n_feat)], ["id", "features"]
    )
    sparse = spark.createDataFrame(
        [
            (j, SparseVector(n_inst, {i: M[j, i] for i in range(n_inst) if M[j, i] != 0.0}))
            for j in range(n_feat)
        ],
        ["id", "features"],
    )
    m_d = RowSelector(numTopRows=2, labelVector=labels, outputCol="k").fit(dense)
    m_s = RowSelector(numTopRows=2, labelVector=labels, outputCol="k").fit(sparse)
    assert m_d.getSelectedRows() == m_s.getSelectedRows()
    assert m_d.getSelectedRows()[0] == 2
