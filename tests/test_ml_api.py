from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml import Pipeline
from pyspark.ml.feature import VectorAssembler

from spark_ifs_spark.ml import (
    FeatureSelector,
    FeatureSelectorModel,
    RowSelector,
    RowSelectorModel,
)
from spark_ifs_spark.operators.select_columns import select_columns
from spark_ifs_spark.sources.generator import random_matrix


@pytest.fixture(scope="module")
def conv(spark):
    mat = random_matrix(rows=120, cols=9, seed=77)
    names = [f"f{j}" for j in range(8)]
    df = spark.createDataFrame([tuple(r) for r in mat], ["label", *names])
    return df, names, mat


def test_pipeline_fit_transform(spark, conv):
    df, names, mat = conv
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=names, outputCol="features"),
            FeatureSelector(numTopFeatures=3, outputCol="selected"),
        ]
    )
    model = pipe.fit(df)
    fsm = model.stages[1]
    sel = fsm.getSelectedFeatures()
    assert len(sel) == 3
    # parity with the functional API
    want = select_columns(df, "label", names, num=3)
    assert sel == [i for i, _ in want]
    out = model.transform(df)
    row = out.select("features", "selected").first()
    # transform slices by SORTED indices (FS:122,154)
    dense = row["features"].toArray()
    assert list(row["selected"].toArray()) == [dense[i] for i in sorted(sel)]


def test_feature_selector_array_features(spark, conv):
    df, names, mat = conv
    arr_df = df.selectExpr("label", f"array({', '.join('CAST(%s AS DOUBLE)' % n for n in names)}) AS features")
    model = FeatureSelector(numTopFeatures=3, outputCol="sel").fit(arr_df)
    out = model.transform(arr_df).first()
    assert len(out["sel"]) == 3


def test_schema_validation(spark, conv):
    df, names, _ = conv
    va = VectorAssembler(inputCols=names, outputCol="features")
    vdf = va.transform(df)
    # non-integral label rejected (FS:103-104)
    bad = vdf.withColumn("label", vdf["label"].cast("double"))
    with pytest.raises(TypeError, match="integral"):
        FeatureSelector(outputCol="out").fit(bad)
    # pre-existing output column rejected
    with pytest.raises(ValueError, match="already exists"):
        FeatureSelector(outputCol="features").fit(vdf)
    # missing features column
    with pytest.raises((ValueError, TypeError)):
        FeatureSelector(featuresCol="nope", outputCol="out").fit(df)


def test_model_persistence(spark, conv, tmp_path):
    df, names, _ = conv
    va = VectorAssembler(inputCols=names, outputCol="features")
    vdf = va.transform(df)
    model = FeatureSelector(numTopFeatures=2, outputCol="out").fit(vdf)
    path = str(tmp_path / "fsm")
    model.write().overwrite().save(path)
    loaded = FeatureSelectorModel.load(path)
    assert loaded.getSelectedFeatures() == model.getSelectedFeatures()
    assert loaded.transform(vdf).count() == vdf.count()
    # scores survive the round trip (persisted as a Param)
    assert model.getSelectionScores() is not None
    assert loaded.getSelectionScores() == model.getSelectionScores()
    assert len(loaded.getSelectionScores()) == 2


def test_row_selector(spark):
    mat = random_matrix(rows=100, cols=8, seed=55)
    arr = np.array(mat, dtype=float)
    labels = arr[:, 0].tolist()
    feats = arr[:, 1:].T
    rows = [(int(j), [float(v) for v in feats[j]]) for j in range(feats.shape[0])]
    df = spark.createDataFrame(rows, ["id", "features"])

    rs = RowSelector(numTopRows=3, labelVector=labels, outputCol="keep")
    model = rs.fit(df)
    assert len(model.getSelectedRows()) == 3
    out = model.transform(df)
    flags = {r["id"]: r["keep"] for r in out.collect()}
    assert sum(flags.values()) == 3
    assert all(flags[i] for i in model.getSelectedRows())
    # filtered transform drops non-selected rows (RS:203)
    rs_f = RowSelector(numTopRows=3, labelVector=labels, outputCol="keep", filtered=True)
    model_f = rs_f.fit(df)
    assert model_f.transform(df).count() == 3
    # empty labelVector rejected (RS:149)
    with pytest.raises(ValueError, match="labelVector"):
        RowSelector(numTopRows=2, outputCol="k2").fit(df)


def test_row_selector_persistence(spark, tmp_path):
    mat = random_matrix(rows=60, cols=6, seed=3)
    arr = np.array(mat, dtype=float)
    rows = [(int(j), [float(v) for v in arr[:, 1:].T[j]]) for j in range(5)]
    df = spark.createDataFrame(rows, ["id", "features"])
    model = RowSelector(numTopRows=2, labelVector=arr[:, 0].tolist(), outputCol="k").fit(df)
    path = str(tmp_path / "rsm")
    model.write().overwrite().save(path)
    loaded = RowSelectorModel.load(path)
    assert loaded.getSelectedRows() == model.getSelectedRows()
    assert loaded.getFiltered() == model.getFiltered()
    assert model.getSelectionScores() is not None
    assert loaded.getSelectionScores() == model.getSelectionScores()


def test_quality_classifier_fit_transform_persist(spark, tmp_path):
    """QualityClassifier: Pipeline-surface parity with the selectors —
    fit/transform, weights as Params, DefaultParams save/load round
    trip, and transform as a pure projection (no shuffle)."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.ml.quality_classifier import (
        QualityClassifier,
        QualityClassifierModel,
    )
    from spark_ifs_spark.operators.lr import lr_train
    from spark_ifs_spark.plans.checks import assert_no_exchange

    rows = [(i, 1.0, 2.0, 1.0) for i in range(20)]
    rows += [(100 + i, 1.0, -2.0, 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "x0", "x1", "label"])
    est = QualityClassifier(featureCols=["x0", "x1"], labelCol="label", numIters=3)
    model = est.fit(df)
    # weights identical to the raw operator (same arithmetic path)
    assert model.getWeightsMicro() == lr_train(df, ["x0", "x1"], "label", iters=3)

    out = model.transform(df)
    assert "score_micro" in out.columns and "doc_id" in out.columns
    assert_no_exchange(out, "QualityClassifierModel.transform")
    scored = {r["doc_id"]: r["score_micro"] for r in out.collect()}
    assert min(scored[i] for i in range(20)) > max(scored[100 + i] for i in range(20))

    path = str(tmp_path / "qc_model")
    model.save(path)
    loaded = QualityClassifierModel.load(path)
    assert loaded.getWeightsMicro() == model.getWeightsMicro()
    assert loaded.getFeatureCols() == ["x0", "x1"]
    relo = {r["doc_id"]: r["score_micro"] for r in loaded.transform(df).collect()}
    assert relo == scored


def test_quality_classifier_rejects_bad_params(spark):
    import pytest as _pytest

    from spark_ifs_spark.ml.quality_classifier import QualityClassifier

    df = spark.createDataFrame([(1, 1.0, 0.0)], ["id", "x0", "label"])
    with _pytest.raises(ValueError, match="featureCols"):
        QualityClassifier(labelCol="label").fit(df)
    with _pytest.raises(ValueError, match="numIters"):
        QualityClassifier(featureCols=["x0"]).setNumIters(0)
    model = QualityClassifier(featureCols=["x0"], labelCol="label").fit(df)
    with _pytest.raises(ValueError, match="already exists"):
        model.transform(df.withColumn("score_micro", df["x0"]))


def test_gopher_filter_transform_and_persist(spark, tmp_path):
    from spark_ifs_spark.ml.gopher_filter import GopherFilter

    docs = spark.createDataFrame(
        [
            (1, "tiny"),
            (2, " ".join(["the", "of", "a", "to", "word", "nice"] * 10)),
        ],
        "doc_id long, text string",
    )
    annotated = GopherFilter(idCol="doc_id", textCol="text").transform(docs)
    got = {r["doc_id"]: r["pass_all"] for r in annotated.collect()}
    assert got == {1: False, 2: True}
    assert "ok_top_word" in annotated.columns

    dropped = GopherFilter(
        idCol="doc_id", textCol="text", filterRows=True
    ).transform(docs)
    assert [r["doc_id"] for r in dropped.collect()] == [2]
    assert dropped.columns == docs.columns  # filter mode adds nothing

    path = str(tmp_path / "gopher")
    stage = GopherFilter(idCol="doc_id", textCol="text", filterRows=True)
    stage.write().overwrite().save(path)
    loaded = GopherFilter.load(path)
    assert loaded.getFilterRows() is True
    assert loaded.getIdCol() == "doc_id"
    assert [r["doc_id"] for r in loaded.transform(docs).collect()] == [2]


def test_gopher_filter_in_pipeline(spark):
    from pyspark.ml import Pipeline

    from spark_ifs_spark.ml.gopher_filter import GopherFilter

    docs = spark.createDataFrame(
        [
            (1, "x"),
            (2, " ".join(["the", "of", "a", "to", "word", "nice"] * 10)),
        ],
        "doc_id long, text string",
    )
    pipe = Pipeline(stages=[GopherFilter(idCol="doc_id", textCol="text", filterRows=True)])
    out = pipe.fit(docs).transform(docs)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_gopher_filter_keeps_null_and_duplicate_ids_when_not_filtering(spark):
    """filterRows=False must preserve EVERY row: null-id rows survive
    with null flags (left join), duplicate-id rows come back exactly
    once each (flags are deduped per id — no k x k fan-out)."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.ml.gopher_filter import GopherFilter

    good = "the quick brown fox jumps with and for was that " * 4
    rows = [
        (1, good), (2, "tiny"), (2, good), (None, good), (None, "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = GopherFilter(idCol="doc_id", textCol="text").transform(docs)
    assert out.count() == len(rows)  # row-preserving
    null_rows = out.filter(F.col("doc_id").isNull()).collect()
    assert len(null_rows) == 2
    assert all(r["pass_all"] is None for r in null_rows)
    assert out.filter(F.col("doc_id") == 2).count() == 2
