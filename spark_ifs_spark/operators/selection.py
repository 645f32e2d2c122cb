"""Corpus data-selection operators (DSIR-style importance resampling).

DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) — picks pretraining documents from a large *raw*
corpus so the selection resembles a small *target* corpus. Both
corpora are summarized by a bag-of-hashed-features unigram model; each
raw document is scored by the log-likelihood ratio

    score(d) = sum_{w in d} [ log p_target(bucket(w)) - log p_raw(bucket(w)) ]

with add-``alpha`` smoothed bucket probabilities, and the top-scoring
documents are kept (the paper resamples with Gumbel noise; the
deterministic top-k variant here is the reproducible-gate form and is
what most production pipelines run).

Engine-portable determinism: buckets come from the package's md5-based
:func:`~spark_ifs_spark.functions.hashing.md5_int60` (identical in
Spark and DuckDB), never an engine-native hash.

Scale shape (the 100 TB posture):

- the corpus is scanned twice — once to build the ``B``-bucket count
  table (map-side partial aggregation collapses each task's output to
  ≤ ``B`` rows before the shuffle, so the shuffle is O(B × tasks), not
  O(tokens)), once to score;
- the bucket-weight table (≤ ``B`` rows) joins back **broadcast** — the
  scoring pass is scan + broadcast-hash-join + one shuffle keyed by
  document id;
- top-k selection uses ``orderBy().limit(k)`` (Spark's distributed
  take-ordered), never a global single-task sort; the rank window runs
  over the k survivors only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_ifs_spark.functions.hashing import md5_int60


def hashed_token_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int,
    carry: dict[str, Column] | None = None,
) -> DataFrame:
    """``(id, [carry...], b)`` — one row per non-empty whitespace token,
    with ``b = md5_int60(token) % num_buckets``. ``carry`` columns are
    computed per *document* and ride the explode (re-attaching them
    later would be a full-corpus join)."""
    carry = carry or {}
    ex = df.select(
        F.col(id_col).alias("id"),
        *[c.alias(name) for name, c in carry.items()],
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return ex.select(
        "id", *carry.keys(), (md5_int60(F.col("w")) % num_buckets).alias("b")
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    num_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """``(id, score)`` — DSIR log-likelihood-ratio score per document.

    ``is_target`` is a boolean Column over ``df`` marking the target
    subcorpus (e.g. ``F.col("lang") == "en"``); the raw distribution is
    the whole of ``df``. Add-``alpha`` smoothing keeps every bucket
    weight finite even for buckets the target never hits.
    """
    toks = hashed_token_buckets(
        df, id_col, text_col, num_buckets,
        carry={"tgt": is_target.cast("int")},
    )
    counts = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"), F.sum("tgt").alias("ct")
    )
    totals = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(alpha)) / (F.col("nt") + F.lit(alpha * num_buckets)))
            - F.log((F.col("cr") + F.lit(alpha)) / (F.col("nr") + F.lit(alpha * num_buckets)))
        ).alias("w"),
    )
    return (
        toks.join(F.broadcast(weights), "b")
        .groupBy("id")
        .agg(F.sum("w").alias("score"))
    )


def dsir_top_k(scores: DataFrame, k: int) -> DataFrame:
    """``(rank, id, score)`` — the ``k`` highest-scoring documents.

    Ranking happens ON ``round(score, 6)`` with the id as tie-break
    (the package's engine-portable float-ranking convention), and the
    global order is produced by ``orderBy().limit(k)`` — Spark's
    distributed take-ordered — with the rank window running over the
    ``k`` survivors only, never the full corpus.
    """
    top = (
        scores.select("id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).alias("rank"), "id", "score"
    )
