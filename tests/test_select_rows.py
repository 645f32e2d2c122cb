from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_ifs_spark.operators.melt import transpose_to_alternate
from spark_ifs_spark.operators.scores import MrmrRowScore, RowScore, mi_vec
from spark_ifs_spark.operators.select_columns import select_columns
from spark_ifs_spark.operators.select_rows import select_rows
from spark_ifs_spark.sources.generator import random_matrix
from tests.oracle_mrmr import greedy_mrmr


def _alternate_df(spark, mat):
    """Build (id, features) alternate encoding + label row from a matrix."""
    arr = np.array(mat, dtype=float)
    labels = arr[:, 0].tolist()
    feats = arr[:, 1:].T  # feature j -> instance vector
    rows = [(int(j), [float(v) for v in feats[j]]) for j in range(feats.shape[0])]
    df = spark.createDataFrame(rows, ["id", "features"])
    return df, labels


def test_matches_numpy_oracle(spark):
    mat = random_matrix(rows=200, cols=11, seed=21)
    df, labels = _alternate_df(spark, mat)
    got = select_rows(df, num=4, labels_row=labels)
    arr = np.array(mat, dtype=float)
    want = greedy_mrmr(arr[:, 1:], arr[:, 0], 4)
    assert [int(i) for i, _ in got] == [i for i, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-9)


def test_cross_encoding_agreement(spark):
    """The reference's own differential check (CommandLine.scala:167-169):
    conventional and alternate selection must agree."""
    mat = random_matrix(rows=150, cols=10, seed=33)
    names = [f"f{j}" for j in range(9)]
    conv = spark.createDataFrame([tuple(map(float, r)) for r in mat], ["label", *names])
    alt, labels = _alternate_df(spark, mat)
    conv_sel = select_columns(conv, "label", names, num=4)
    alt_sel = select_rows(alt, num=4, labels_row=labels)
    assert [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]
    for (_, a), (_, b) in zip(conv_sel, alt_sel):
        assert a == pytest.approx(b, rel=1e-9)


def test_transpose_roundtrip_agreement(spark):
    """transpose_to_alternate feeds select_rows ≡ select_columns."""
    mat = random_matrix(rows=80, cols=7, seed=9)
    names = [f"f{j}" for j in range(6)]
    conv = spark.createDataFrame(
        [(i, *map(float, r)) for i, r in enumerate(mat)], ["iid", "label", *names]
    )
    alt = transpose_to_alternate(conv, names, order_col="iid")
    labels = [float(r[0]) for r in mat]
    conv_sel = select_columns(conv, "label", names, num=3)
    alt_sel = select_rows(alt, num=3, labels_row=labels)
    assert [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]


def test_duplicate_ids_error(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (1, [1.0, 0.0])], ["id", "features"]
    )
    with pytest.raises(ValueError, match="duplicate"):
        select_rows(df, num=1, labels_row=[0.0, 1.0])


def test_empty_labels_error(spark):
    df = spark.createDataFrame([(1, [0.0])], ["id", "features"])
    with pytest.raises(ValueError, match="non-empty"):
        select_rows(df, num=1, labels_row=[])


def test_num_cap(spark):
    mat = random_matrix(rows=60, cols=5, seed=4)
    df, labels = _alternate_df(spark, mat)
    assert len(select_rows(df, num=50, labels_row=labels)) == 4  # IFS:156 cap


def test_generic_row_score_plugin(spark):
    """Non-incremental plug-in path agrees with the default on mRMR."""

    class MyMrmr(RowScore):
        higher_is_better = True

        def score(self, feature, label_row, selected):
            rel = mi_vec(feature, label_row)
            if not selected:
                return rel
            return rel - sum(mi_vec(feature, s) for s in selected) / len(selected)

    mat = random_matrix(rows=100, cols=7, seed=13)
    df, labels = _alternate_df(spark, mat)
    default = select_rows(df, num=3, labels_row=labels, score=MrmrRowScore())
    plugin = select_rows(df, num=3, labels_row=labels, score=MyMrmr())
    assert [i for i, _ in default] == [i for i, _ in plugin]


def test_incore_and_distributed_paths_agree(spark):
    """The in-core escape hatch must be semantically invisible vs the
    distributed per-round plan (both score orders and values)."""
    mat = random_matrix(rows=60, cols=9, seed=11)
    alt, labels = _alternate_df(spark, mat)
    incore = select_rows(alt, num=4, labels_row=labels)
    dist = select_rows(alt, num=4, labels_row=labels, incore_cell_budget=0)
    assert [int(i) for i, _ in incore] == [int(i) for i, _ in dist]
    for (_, a), (_, b) in zip(incore, dist):
        assert abs(a - b) < 1e-9


def test_cross_encoding_agreement_miq(spark):
    """Cross-encoding differential invariant holds for the MIQ plug-in
    too, through both the in-core and distributed paths."""
    from spark_ifs_spark.operators.scores import MiqColumnScore, MiqRowScore

    mat = random_matrix(rows=120, cols=8, seed=5)
    names = [f"f{j}" for j in range(7)]
    conv = spark.createDataFrame([tuple(map(float, r)) for r in mat], ["label", *names])
    alt, labels = _alternate_df(spark, mat)
    conv_sel = select_columns(conv, "label", names, num=3, score=MiqColumnScore())
    alt_sel = select_rows(alt, num=3, labels_row=labels, score=MiqRowScore())
    alt_dist = select_rows(
        alt, num=3, labels_row=labels, score=MiqRowScore(), incore_cell_budget=0
    )
    assert [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]
    assert [int(i) for i, _ in alt_sel] == [int(i) for i, _ in alt_dist]
    for (_, a), (_, b) in zip(conv_sel, alt_sel):
        assert a == pytest.approx(b, rel=1e-9)


def test_snapshot_every_identical_selections_and_cleanup(spark, tmp_path):
    """snapshot_every's parquet lineage truncation must not change ONE
    selection or score, and default (tempdir) snapshots must be removed
    when the loop returns."""
    import glob

    mat = random_matrix(rows=120, cols=9, seed=33)
    df, labels = _alternate_df(spark, mat)
    plain = select_rows(df, num=5, labels_row=labels, incore_cell_budget=0)
    snap = select_rows(
        df, num=5, labels_row=labels, incore_cell_budget=0, snapshot_every=2
    )
    assert snap == plain
    assert glob.glob("/tmp/spark_ifs_sel_*") == []
    # explicit work_dir: snapshots are the caller's to keep
    kept = select_rows(
        df, num=5, labels_row=labels, incore_cell_budget=0,
        snapshot_every=2, work_dir=str(tmp_path / "snaps"),
    )
    assert kept == plain
    assert (tmp_path / "snaps").exists()


def test_snapshot_truncates_lineage(spark):
    """After a snapshot the loop state's physical plan must be a parquet
    scan (+ the persisted InMemoryRelation), not the r-round UDF chain —
    the bounded-recovery property the knob exists for."""
    from spark_ifs_spark.operators.select_rows import _snapshot_state
    import tempfile, shutil

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(10)], ["id", "features"]
    )
    deep = df
    for _ in range(3):
        deep = deep.withColumn("features", F.transform("features", lambda x: x + 1))
    base = tempfile.mkdtemp(prefix="spark_ifs_sel_test_")
    try:
        snapped = _snapshot_state(deep.persist(), f"{base}/r1")
        plan = snapped._jdf.queryExecution().optimizedPlan().toString()
        assert "transform" not in plan
        snapped.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cross_encoding_agreement_jmi(spark):
    """Cross-encoding differential invariant holds for the JMI plug-in —
    the triple statistic I((cand, s); label) must agree between the
    conventional encoding (in-core AND distributed triple-count plans)
    and the alternate encoding's pandas-UDF pair-code path."""
    from spark_ifs_spark.operators.scores import JmiColumnScore, JmiRowScore

    mat = random_matrix(rows=120, cols=8, seed=9)
    names = [f"f{j}" for j in range(7)]
    conv = spark.createDataFrame([tuple(map(float, r)) for r in mat], ["label", *names])
    alt, labels = _alternate_df(spark, mat)
    conv_sel = select_columns(conv, "label", names, num=3, score=JmiColumnScore())
    conv_dist = select_columns(
        conv, "label", names, num=3, score=JmiColumnScore(), incore_cell_budget=0
    )
    alt_sel = select_rows(alt, num=3, labels_row=labels, score=JmiRowScore())
    assert [i for i, _ in conv_sel] == [i for i, _ in conv_dist]
    assert [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]
    for (_, a), (_, b) in zip(conv_sel, conv_dist):
        assert a == pytest.approx(b, rel=1e-9)
    for (_, a), (_, b) in zip(conv_sel, alt_sel):
        assert a == pytest.approx(b, rel=1e-9)


def test_cross_encoding_agreement_cmim(spark):
    """Cross-encoding differential invariant holds for the CMIM plug-in:
    the conditional statistic I(cand; label | s) must agree between the
    conventional encoding (both strategies) and the alternate encoding."""
    from spark_ifs_spark.operators.scores import CmimColumnScore, CmimRowScore

    mat = random_matrix(rows=120, cols=8, seed=13)
    names = [f"f{j}" for j in range(7)]
    conv = spark.createDataFrame([tuple(map(float, r)) for r in mat], ["label", *names])
    alt, labels = _alternate_df(spark, mat)
    conv_sel = select_columns(conv, "label", names, num=3, score=CmimColumnScore())
    conv_dist = select_columns(
        conv, "label", names, num=3, score=CmimColumnScore(), incore_cell_budget=0
    )
    alt_sel = select_rows(alt, num=3, labels_row=labels, score=CmimRowScore())
    assert [i for i, _ in conv_sel] == [i for i, _ in conv_dist]
    assert [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]
    for (_, a), (_, b) in zip(conv_sel, conv_dist):
        assert a == pytest.approx(b, rel=1e-9)
    for (_, a), (_, b) in zip(conv_sel, alt_sel):
        assert a == pytest.approx(b, rel=1e-9)
