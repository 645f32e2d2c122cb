"""``QualityClassifier`` Estimator/Model — the distributed
logistic-regression trainer (``operators/lr.py``) exposed through the
same Spark ML Pipeline surface as the reference's stages
(``FeatureSelector.scala`` is the API model: Params + fit/transform +
``DefaultParamsWritable`` persistence), so a corpus quality filter
drops into a ``Pipeline`` next to the selectors and the BPE tokenizer.

``fit`` runs ``numIters`` full-batch GD steps (one d-cell aggregate per
iteration, O(d) driver state, exact integer-micro weights); the model
persists the weights as an int-list Param and ``transform`` adds a
``score_micro`` column (``floor(σ(w·x)·1e6)``) as a zero-shuffle
map-side projection.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasLabelCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame

from spark_ifs_spark.operators.lr import lr_score_expr, lr_train


class _QualityParams(HasLabelCol, HasOutputCol):
    featureCols = Param(
        Params._dummy(),
        "featureCols",
        "numeric feature column names (include a literal-1.0 column "
        "for an intercept)",
        typeConverter=TypeConverters.toListString,
    )
    numIters = Param(
        Params._dummy(),
        "numIters",
        "full-batch gradient-descent iterations (> 0)",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            numIters=2,
            labelCol="label",
            outputCol="score_micro",
            featureCols=[],
        )

    def getFeatureCols(self) -> list[str]:
        return self.getOrDefault(self.featureCols)

    def getNumIters(self) -> int:
        return self.getOrDefault(self.numIters)


class QualityClassifier(
    Estimator, _QualityParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Trains a logistic quality classifier on numeric feature columns.

    >>> model = QualityClassifier(
    ...     featureCols=["x0", "x1"], labelCol="y"
    ... ).fit(feats)
    >>> model.transform(feats)  # adds BIGINT "score_micro"
    """

    @keyword_only
    def __init__(
        self,
        *,
        featureCols=(),
        labelCol="label",
        outputCol="score_micro",
        numIters=2,
    ):
        super().__init__()
        kwargs = dict(self._input_kwargs)
        if "featureCols" in kwargs:
            kwargs["featureCols"] = list(kwargs["featureCols"])
        self._set(**kwargs)

    def setFeatureCols(self, value: list[str]) -> "QualityClassifier":
        return self._set(featureCols=list(value))

    def setNumIters(self, value: int) -> "QualityClassifier":
        if value <= 0:
            raise ValueError("numIters must be > 0")
        return self._set(numIters=value)

    def _fit(self, dataset: DataFrame) -> "QualityClassifierModel":
        cols = self.getFeatureCols()
        if not cols:
            raise ValueError("featureCols must be non-empty")
        w = lr_train(
            dataset, cols, self.getOrDefault(self.labelCol), self.getNumIters()
        )
        model = QualityClassifierModel()
        model._set(
            featureCols=cols,
            labelCol=self.getOrDefault(self.labelCol),
            outputCol=self.getOrDefault(self.outputCol),
            numIters=self.getNumIters(),
            weightsMicro=[int(x) for x in w],
        )
        return model


class QualityClassifierModel(
    Model, _QualityParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Holds the trained integer-micro weight vector; ``transform``
    appends the score column to the input (all columns preserved) as a
    map-side projection — zero shuffles at any corpus size."""

    weightsMicro = Param(
        Params._dummy(),
        "weightsMicro",
        "trained weights in integer micro-units, aligned to featureCols",
        typeConverter=TypeConverters.toListInt,
    )

    def getWeightsMicro(self) -> list[int]:
        return self.getOrDefault(self.weightsMicro)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        out = self.getOrDefault(self.outputCol)
        if out in dataset.columns:
            raise ValueError(f"output column {out!r} already exists")
        return dataset.withColumn(
            out, lr_score_expr(self.getFeatureCols(), self.getWeightsMicro())
        )
