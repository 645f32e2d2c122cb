"""``GopherFilter`` Transformer — the Gopher quality-rule bundle
(``operators/textstats.py:gopher_quality_flags``) exposed through the
Spark ML Pipeline surface (same Params + ``DefaultParamsWritable``
pattern the reference uses for its stages, ``FeatureSelector.scala``),
so a rule-based corpus filter composes in a ``Pipeline`` with the
selectors, the BPE tokenizer, and the trained quality classifier.

Stateless by design — a Transformer, not an Estimator: the rules are
thresholds, not learned parameters, so there is no fit step and the
stage persists as pure Params. ``transform`` joins the per-doc flags
back on the id and either annotates (``filterRows=False``, keeps every
row plus the flag columns) or drops failing rows (``filterRows=True``),
never touching row content — the plan stays the operator's
(3 scan-fused rules + the one bounded-key shuffle of the top-word
rule).
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ifs_spark.operators.textstats import gopher_quality_flags


class GopherFilter(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Annotates (or drops) documents by the Gopher quality rules.

    >>> GopherFilter(idCol="doc_id", textCol="text").transform(docs)
    # adds ok_word_count / ok_mean_word_len / ok_stopwords /
    # ok_top_word / pass_all
    >>> GopherFilter(idCol="doc_id", textCol="text",
    ...              filterRows=True).transform(docs)
    # only rows with pass_all
    """

    idCol = Param(
        Params._dummy(), "idCol", "document id column",
        typeConverter=TypeConverters.toString,
    )
    textCol = Param(
        Params._dummy(), "textCol", "document text column",
        typeConverter=TypeConverters.toString,
    )
    filterRows = Param(
        Params._dummy(), "filterRows",
        "True: drop failing rows; False: annotate with flag columns",
        typeConverter=TypeConverters.toBoolean,
    )

    @keyword_only
    def __init__(self, *, idCol="doc_id", textCol="text", filterRows=False):
        super().__init__()
        self._setDefault(idCol="doc_id", textCol="text", filterRows=False)
        self._set(**self._input_kwargs)

    def getIdCol(self) -> str:
        return self.getOrDefault(self.idCol)

    def getTextCol(self) -> str:
        return self.getOrDefault(self.textCol)

    def getFilterRows(self) -> bool:
        return self.getOrDefault(self.filterRows)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        """With ``filterRows=False`` every input row is preserved: the
        flags (one row per distinct non-null id) are LEFT-joined back,
        so null-id rows survive with null flags, and duplicate-id rows
        each carry their id's flags (computed from one of the texts
        sharing that id). With ``filterRows=True``, null-id rows are
        dropped along with failing rows (they have no flags to pass)."""
        id_col = self.getIdCol()
        flags = gopher_quality_flags(dataset, id_col, self.getTextCol()).drop(
            "n_words"
        )
        # one flag row per id (first wins on duplicates) so the join
        # back is row-preserving — never a k×k fan-out on repeated ids
        flag_cols = [c for c in flags.columns if c != "id"]
        flags = flags.groupBy("id").agg(
            *[F.first(c).alias(c) for c in flag_cols]
        )
        joined = dataset.join(
            flags.withColumnRenamed("id", id_col), id_col, "left"
        )
        if self.getFilterRows():
            return joined.filter(F.col("pass_all")).drop(
                "ok_word_count", "ok_mean_word_len", "ok_stopwords",
                "ok_top_word", "pass_all",
            )
        return joined
