"""``FeatureSelector`` Estimator/Model — conventional encoding.

API parity with the reference's ML stage
(``/root/reference/src/main/scala/ifs/ml/feature/FeatureSelector.scala``):
params ``numTopFeatures`` (default 10, must be >0, ``FS:17-24``),
``labelCol``/``featuresCol``/``outputCol``; ``fit`` runs greedy mRMR
selection; the model holds ``selectedFeatures`` in selection order
(``FS:119``) and ``transform`` slices the features vector by the selected
indices **sorted ascending** — original column order, not selection order
(``FS:122,154``). Persistable with ``DefaultParamsWritable`` (``FS:45``)
and usable inside a ``Pipeline`` (``CommandLine.scala:99``).

Spark-first difference: ``fit`` never leaves the DataFrame API (the
reference converts to ``RDD[LabeledPoint]`` at ``FS:82-84``). The features
vector is unpacked into per-index element columns — a pure projection that
Catalyst prunes per greedy round.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasFeaturesCol, HasLabelCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ifs_spark.ml._schema import (
    features_as_array,
    is_vector_type,
    validate_schema,
)
from spark_ifs_spark.operators.select_columns import select_columns


class _FeatureSelectorParams(HasLabelCol, HasFeaturesCol, HasOutputCol):
    numTopFeatures = Param(
        Params._dummy(),
        "numTopFeatures",
        "number of features to select (> 0)",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(numTopFeatures=10, labelCol="label", featuresCol="features")

    def getNumTopFeatures(self) -> int:
        return self.getOrDefault(self.numTopFeatures)


class FeatureSelector(
    Estimator, _FeatureSelectorParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Greedy mRMR feature selection over a (label, features-vector) DataFrame.

    >>> fs = (FeatureSelector()
    ...       .setNumTopFeatures(10)
    ...       .setLabelCol("label")
    ...       .setFeaturesCol("features")
    ...       .setOutputCol("selected"))
    >>> model = fs.fit(df)
    >>> model.transform(df)

    (usage mirror of ``FS:33-42``)
    """

    @keyword_only
    def __init__(self, *, numTopFeatures=10, labelCol="label", featuresCol="features", outputCol=None):
        super().__init__()
        kwargs = self._input_kwargs
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        self._set(**kwargs)

    def setNumTopFeatures(self, value: int) -> "FeatureSelector":
        if value <= 0:
            raise ValueError("numTopFeatures must be > 0")
        return self._set(numTopFeatures=value)

    def setLabelCol(self, value: str) -> "FeatureSelector":
        return self._set(labelCol=value)

    def setFeaturesCol(self, value: str) -> "FeatureSelector":
        return self._set(featuresCol=value)

    def setOutputCol(self, value: str) -> "FeatureSelector":
        return self._set(outputCol=value)

    def _fit(self, dataset: DataFrame) -> "FeatureSelectorModel":
        label, feats, out = self.getLabelCol(), self.getFeaturesCol(), self.getOutputCol()
        validate_schema(dataset.schema, label, feats, out)
        first = dataset.select(feats).first()
        if first is None:
            raise ValueError("empty dataset")
        dim = len(first[0])
        elem_cols = [f"__f{i}" for i in range(dim)]
        arr = features_as_array(dataset, feats)
        wide = dataset.select(
            F.col(label).cast("double").alias("__label"),
            *[arr[i].alias(c) for i, c in enumerate(elem_cols)],
        )
        result = select_columns(wide, "__label", elem_cols, self.getNumTopFeatures())
        model = FeatureSelectorModel()
        model._set(
            labelCol=label,
            featuresCol=feats,
            outputCol=out,
            numTopFeatures=self.getNumTopFeatures(),
            selectedFeatures=[i for i, _ in result],
            selectionScores=[float(s) for _, s in result],
        )
        return model


class FeatureSelectorModel(
    Model, _FeatureSelectorParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Holds ``selectedFeatures`` (selection order, ``FS:119``); transform
    projects the features vector onto the selected indices sorted ascending
    (``FS:122,154`` — a ``VectorSlicer`` in the reference)."""

    selectedFeatures = Param(
        Params._dummy(),
        "selectedFeatures",
        "selected feature indices in selection order",
        typeConverter=TypeConverters.toListInt,
    )
    selectionScores = Param(
        Params._dummy(),
        "selectionScores",
        "greedy-round scores aligned with selectedFeatures (extension)",
        typeConverter=TypeConverters.toListFloat,
    )

    def getSelectedFeatures(self) -> list[int]:
        return self.getOrDefault(self.selectedFeatures)

    def getSelectionScores(self) -> list[float] | None:
        """Scores aligned with ``selectedFeatures``; persisted as a Param,
        so they survive a save/load round trip."""
        return (
            self.getOrDefault(self.selectionScores)
            if self.isDefined(self.selectionScores)
            else None
        )

    def _transform(self, dataset: DataFrame) -> DataFrame:
        feats, out = self.getFeaturesCol(), self.getOutputCol()
        if out in dataset.columns:
            raise ValueError(f"output column {out!r} already exists")
        indices = sorted(self.getSelectedFeatures())
        fdt = dataset.schema[feats].dataType
        if is_vector_type(fdt):
            from pyspark.ml.feature import VectorSlicer

            return VectorSlicer(inputCol=feats, outputCol=out, indices=indices).transform(dataset)
        sliced = F.array(*[F.col(feats)[i] for i in indices])
        return dataset.withColumn(out, sliced)
