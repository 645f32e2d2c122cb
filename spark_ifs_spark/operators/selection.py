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


def doremi_weights(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    text_col: str,
    eta: float = 8.0,
    smoothing: float = 0.2,
    ll: DataFrame | None = None,
) -> DataFrame:
    """DoReMi-style domain-weight update (Xie et al., 2023,
    arXiv:2305.10429): re-weight corpus domains by their *excess loss*
    under a cheap proxy model, via one multiplicative-weights step.

    The paper trains a small proxy LM with Group-DRO and uses the
    per-domain gap between proxy and reference loss; the relational
    proxy here is the corpus-trained bigram LM
    (:func:`~spark_ifs_spark.operators.textstats.bigram_logprob` —
    the same CCNet-style signal ``ppl_buckets`` partitions on), with
    the best-scoring domain as the reference, so

        excess(s)   = loss(s) − min_t loss(t)          (integer micronats)
        alpha(s)    ∝ exp(eta · excess(s) / 1e6)        (softmax over S)
        weight(s)   = (1 − smoothing)·alpha(s) + smoothing / S

    exactly the DoReMi update shape: hard domains (high excess) gain
    mass, the uniform-smoothing term keeps every domain sampled.
    Returns one row per domain:
    ``(domain, n_bigrams, loss_micro, excess_micro, rate_ppm)`` with
    ``rate_ppm = floor(weight · 1e6)`` — the integer sampling rate
    :func:`~spark_ifs_spark.operators.sampling.weighted_mix` consumes.

    Determinism: per-domain losses are exact integer micronat sums
    (the ``bigram_logprob`` contract), so the only floating step is
    the S-row softmax; its inputs are integers, and the result is
    rounded to 9 decimals before the ppm floor (the cross-engine
    last-ulp guard the package uses everywhere it must ``floor`` a
    computed double).

    Scale shape: everything corpus-sized is inside ``bigram_logprob``
    (two scans, vocabulary-sized shuffles); the update itself runs on
    the S-row domain relation, where the empty-frame windows below are
    a deliberate single-task reduction over S ≤ thousands of rows —
    never corpus data.
    """
    from spark_ifs_spark.operators.textstats import bigram_logprob

    dom = df.select(F.col(id_col).alias("id"), F.col(domain_col).alias("domain"))
    # ``ll`` optionally injects a prebuilt (id, n_bigrams, ll_micronats)
    # relation (e.g. session-staged) in place of the inline LM run
    scored = ll if ll is not None else bigram_logprob(df, id_col, text_col)
    per = (
        scored.join(dom, "id")
        .groupBy("domain")
        .agg(
            F.sum("n_bigrams").alias("n_bigrams"),
            F.sum("ll_micronats").alias("ll"),
        )
        .select(
            "domain",
            "n_bigrams",
            F.floor(
                (-F.col("ll")).cast("double") / F.col("n_bigrams").cast("double")
            )
            .cast("long")
            .alias("loss_micro"),
        )
    )
    w = Window.partitionBy()  # S-row relation: single-task on purpose
    excess = F.col("loss_micro") - F.min("loss_micro").over(w)
    expw = F.exp(F.lit(eta) * excess.cast("double") / F.lit(1e6))
    alpha = expw / F.sum(expw).over(w)
    n_dom = F.count(F.lit(1)).over(w)
    weight = (
        F.lit(1.0 - smoothing) * alpha
        + F.lit(smoothing) / n_dom.cast("double")
    )
    return per.select(
        "domain",
        "n_bigrams",
        "loss_micro",
        excess.alias("excess_micro"),
        F.floor(F.round(weight, 9) * 1e6).cast("long").alias("rate_ppm"),
    )


def coverage_select(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, n: int = 2
) -> DataFrame:
    """``(rank, doc_id, new_terms)`` — greedy maximum-coverage document
    selection: k rounds of "pick the document adding the most
    NOT-YET-COVERED word ``n``-gram terms" (lazy set cover, the
    (1 − 1/e) approximation guarantee of submodular greedy) — the
    coverage-driven seed-corpus / eval-slice picker, and the same
    unrolled-greedy shape as mRMR column selection (``select_columns``)
    with marginal term coverage as the objective. The unit is an
    n-gram (default bigram), not a unigram, because a saturating word
    vocabulary (this corpus's, per the Heaps-fit lesson) lets one long
    document cover everything in round 1 — bigrams keep the objective
    discriminative at every tested scale.

    Plan per round: one broadcast ANTI join of the distinct
    ``(doc, term)`` relation against the covered-term set (bounded by
    the ≤ r·max_doc_vocab terms selected so far — broadcast by AQE),
    one per-doc count aggregate, and a ``max(struct)`` argbest (score
    desc, doc-id-asc ties — the ``_argbest`` convention). The term
    relation is localCheckpoint'ed once and scanned k times; no
    corpus-sized window, no driver state beyond the k winners and the
    covered-term DataFrame. A document with zero uncovered terms has
    no rows after the ANTI join, so it can never win; when no document
    adds coverage the loop stops early (fewer than k rows — matched by
    the oracle, whose empty round-r winner empties all later rounds).
    """
    from spark_ifs_spark.operators.dedup import word_shingles

    spark = df.sparkSession
    terms = (
        word_shingles(df, id_col, text_col, n)
        .withColumnRenamed("sh", "term")
        .localCheckpoint(eager=True)
    )
    covered = None
    out = []
    for r in range(1, k + 1):
        cand = terms if covered is None else terms.join(
            covered, "term", "left_anti"
        )
        counts = cand.groupBy("id").agg(F.count(F.lit(1)).alias("sc"))
        w = counts.agg(
            F.max(F.struct(F.col("sc"), (-F.col("id")).alias("nid")))
        ).first()[0]
        if w is None:
            break
        win_id, new_terms = -w["nid"], int(w["sc"])
        out.append((r, win_id, new_terms))
        won = terms.filter(F.col("id") == win_id).select("term")
        covered = (
            won if covered is None else covered.unionByName(won).distinct()
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out, "rank int, doc_id long, new_terms long"
    )
