"""MI unit + property tests (SURVEY §5 rebuild test plan)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_ifs_spark.functions.mi import (
    check_cardinality,
    mi_from_joint_counts,
    mutual_information,
)
from spark_ifs_spark.operators.scores import mi_vec
from tests.oracle_mrmr import mi as np_mi


def test_mi_hand_computed(spark):
    # 2x2 table: counts [[10, 0], [5, 5]]; zero cell skipped.
    rows = [(0.0, 0.0)] * 10 + [(1.0, 0.0)] * 5 + [(1.0, 1.0)] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    n = 20.0
    expected = (
        (10 / n) * math.log((10 * n) / (10 * 15))
        + (5 / n) * math.log((5 * n) / (10 * 15))
        + (5 / n) * math.log((5 * n) / (10 * 5))
    )
    assert mutual_information(df, "a", "b") == pytest.approx(expected, rel=1e-12)


def test_mi_independent_and_entropy(spark):
    rows = [(float(i % 4), float((i // 4) % 4), float(i % 4)) for i in range(64)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    # perfectly independent → 0
    assert mutual_information(df, "a", "b") == pytest.approx(0.0, abs=1e-12)
    # MI(x, x) = H(x) = ln(4) for uniform 4 levels
    assert mutual_information(df, "a", "c") == pytest.approx(math.log(4), rel=1e-12)


def test_mi_symmetry_and_nonneg(spark):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 5, 300).astype(float)
    b = rng.integers(0, 3, 300).astype(float)
    df = spark.createDataFrame(list(zip(a.tolist(), b.tolist())), ["a", "b"])
    m_ab = mutual_information(df, "a", "b")
    m_ba = mutual_information(df, "b", "a")
    assert m_ab == pytest.approx(m_ba, rel=1e-12)
    assert m_ab >= 0
    assert m_ab == pytest.approx(np_mi(a, b), rel=1e-12)


def test_mi_constant_column(spark):
    rows = [(1.0, float(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, ["a", "b"])
    assert mutual_information(df, "a", "b") == pytest.approx(0.0, abs=1e-12)


def test_mi_grouped(spark):
    # two groups with different tables in one pass
    rows = [("g1", 0.0, 0.0), ("g1", 1.0, 1.0)] * 10 + [("g2", 0.0, 1.0)] * 10 + [
        ("g2", 1.0, 1.0)
    ] * 10
    df = spark.createDataFrame(rows, ["g", "a", "b"])
    joint = df.groupBy("g", "a", "b").count().withColumnRenamed("count", "cnt")
    out = {
        r["g"]: r["mi"]
        for r in mi_from_joint_counts(
            joint, ["g"], a_col="a", b_col="b", count_col="cnt"
        ).collect()
    }
    assert out["g1"] == pytest.approx(math.log(2), rel=1e-12)  # identical columns
    assert out["g2"] == pytest.approx(0.0, abs=1e-12)  # b constant


def test_mi_vec_matches_df(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 6, 500).astype(float)
    b = (a + rng.integers(0, 2, 500)).astype(float)
    df = spark.createDataFrame(list(zip(a.tolist(), b.tolist())), ["a", "b"])
    assert mi_vec(a, b) == pytest.approx(mutual_information(df, "a", "b"), rel=1e-12)
    assert mi_vec(a, b) == pytest.approx(np_mi(a, b), rel=1e-12)


def test_mi_vec_length_mismatch():
    with pytest.raises(ValueError):
        mi_vec(np.zeros(3), np.zeros(4))


def test_cardinality_guard(spark):
    df = spark.range(100_000).selectExpr("CAST(id AS DOUBLE) AS a")
    with pytest.raises(ValueError, match="category limit"):
        check_cardinality(df, ["a"], max_categories=1000)
    check_cardinality(df.selectExpr("a % 10 AS a"), ["a"], max_categories=1000)
