"""``BpeTokenizer`` Estimator/Model — the BPE trainer exposed through
the same Spark ML Pipeline surface as the reference's stages
(``FeatureSelector.scala`` is the API model: Params + fit/transform +
``DefaultParamsWritable`` persistence), so a trained tokenizer drops
into a ``Pipeline`` next to the selectors.

``fit`` learns ``numMerges`` BPE merges (``operators/bpe.py`` — corpus
touched once, merge rounds vocabulary-bounded); the model persists the
merge list as two aligned string-list Params (Spark ML params cannot
hold tuple lists) and ``transform`` adds a token-array column, applying
the merges once per word via map-side folds.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasInputCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ifs_spark.operators.bpe import apply_merges_expr, bpe_train


class _BpeParams(HasInputCol, HasOutputCol):
    numMerges = Param(
        Params._dummy(),
        "numMerges",
        "number of BPE merges to learn (> 0)",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(numMerges=100, inputCol="text", outputCol="tokens")

    def getNumMerges(self) -> int:
        return self.getOrDefault(self.numMerges)


class BpeTokenizer(
    Estimator, _BpeParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Learns a BPE merge table from a text column.

    >>> model = BpeTokenizer(numMerges=50, inputCol="text").fit(docs)
    >>> model.transform(docs)  # adds array<string> "tokens"
    """

    @keyword_only
    def __init__(self, *, numMerges=100, inputCol="text", outputCol="tokens"):
        super().__init__()
        self._set(**self._input_kwargs)

    def setNumMerges(self, value: int) -> "BpeTokenizer":
        if value <= 0:
            raise ValueError("numMerges must be > 0")
        return self._set(numMerges=value)

    def setInputCol(self, value: str) -> "BpeTokenizer":
        return self._set(inputCol=value)

    def setOutputCol(self, value: str) -> "BpeTokenizer":
        return self._set(outputCol=value)

    def _fit(self, dataset: DataFrame) -> "BpeTokenizerModel":
        rows = (
            bpe_train(dataset, self.getInputCol(), self.getNumMerges())
            .orderBy("rank")
            .collect()
        )
        model = BpeTokenizerModel()
        model._set(
            inputCol=self.getInputCol(),
            outputCol=self.getOutputCol(),
            numMerges=self.getNumMerges(),
            mergesLeft=[r["x"] for r in rows],
            mergesRight=[r["y"] for r in rows],
        )
        return model


class BpeTokenizerModel(
    Model, _BpeParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Holds the learned merge table; ``transform`` tokenizes the input
    column into an ``array<string>`` of BPE symbols (whitespace
    pre-tokenization, merges applied left-to-right in learned order —
    standard BPE inference semantics)."""

    mergesLeft = Param(
        Params._dummy(),
        "mergesLeft",
        "left symbols of the learned merges, in merge order",
        typeConverter=TypeConverters.toListString,
    )
    mergesRight = Param(
        Params._dummy(),
        "mergesRight",
        "right symbols of the learned merges, in merge order",
        typeConverter=TypeConverters.toListString,
    )

    def getMerges(self) -> list[tuple[str, str]]:
        return list(
            zip(
                self.getOrDefault(self.mergesLeft),
                self.getOrDefault(self.mergesRight),
            )
        )

    def _transform(self, dataset: DataFrame) -> DataFrame:
        out = self.getOutputCol()
        if out in dataset.columns:
            raise ValueError(f"output column {out!r} already exists")
        merges = self.getMerges()
        words = F.filter(
            F.split(F.col(self.getInputCol()), " "), lambda w: w != ""
        )
        tokens = F.flatten(
            F.transform(
                words, lambda w: apply_merges_expr(F.split(w, ""), merges)
            )
        )
        return dataset.withColumn(out, tokens)
