"""Unit + plan tests for the round-4 additions: market-basket affinity,
Bloom-prefiltered decontamination, boilerplate detection, Gopher quality
flags, and temperature mixing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_ifs_spark.operators.affinity import co_occurrence_pairs
from spark_ifs_spark.operators.dedup import (
    _bloom_build,
    _bloom_might_contain,
    contaminated_ids,
    contaminated_ids_bloom,
)
from spark_ifs_spark.operators.sampling import temperature_mix
from spark_ifs_spark.operators.textstats import (
    boilerplate_fraction,
    gopher_quality_flags,
    shingle_doc_freq,
)
from spark_ifs_spark.plans.checks import count_exchanges, explain_str


# --- market-basket affinity -------------------------------------------------


def test_co_occurrence_pairs_exact(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "b"), (3, "b"),  # duplicate item in basket counts once
        (4, "z"),            # singleton basket emits nothing
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in co_occurrence_pairs(df, "basket", "item").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_co_occurrence_cap_truncates_to_smallest_ids(spark):
    rows = [(1, x) for x in ["d", "b", "a", "c"]]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["item_a"], r["item_b"])
        for r in co_occurrence_pairs(df, "basket", "item", max_items=2).collect()
    }
    # capped to the 2 smallest sorted ids -> only (a, b)
    assert got == {("a", "b")}


def test_co_occurrence_plan_no_join(spark):
    df = spark.createDataFrame([(1, "a")], "basket int, item string")
    out = co_occurrence_pairs(df, "basket", "item")
    plan = explain_str(out, "simple")
    assert "Join" not in plan  # pairs expand map-side, never via self-join
    assert count_exchanges(out) <= 2, plan


# --- Bloom filter -----------------------------------------------------------


def test_bloom_no_false_negatives_and_sane_fp_rate():
    import numpy as np

    rng = np.random.default_rng(42)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    others = others[~np.isin(others, members)]
    bits, m, k = _bloom_build(members, fp_rate=0.01)
    test = _bloom_might_contain(bits, m, k)
    assert test(members).all()  # zero false negatives, by construction
    fp = test(others).mean()
    assert fp < 0.03, f"fp rate {fp} far above the 1% target"


def test_bloom_decontam_matches_broadcast_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_set = docs.filter(F.col("doc_id") % 89 == 0)
    corpus = docs.filter(F.col("doc_id") % 89 != 0)
    exact = {
        r["id"]
        for r in contaminated_ids(corpus, eval_set, "doc_id", "text", n=5).collect()
    }
    bloom = {
        r["id"]
        for r in contaminated_ids_bloom(
            corpus, eval_set, "doc_id", "text", n=5
        ).collect()
    }
    assert bloom == exact  # FPs die in the exact confirm join


def test_bloom_decontam_plan_prefilters_before_join(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = contaminated_ids_bloom(
        docs.filter(F.col("doc_id") % 89 != 0),
        docs.filter(F.col("doc_id") % 89 == 0),
        "doc_id",
        "text",
        n=5,
    )
    plan = explain_str(out, "simple")
    # the Arrow-batched pandas predicate runs corpus-side, pre-shuffle
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan, plan
    assert "LeftSemi" in plan, plan


# --- boilerplate / novelty --------------------------------------------------


@pytest.fixture()
def template_docs(spark):
    template = "all rights reserved worldwide"
    rows = [(i, f"unique{i} words here {template}") for i in range(20)]
    rows += [(100 + i, f"fresh{i} novel{i} content{i} entirely{i}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_doc_freq_flags_template(template_docs):
    out = shingle_doc_freq(template_docs, "doc_id", "text", n=3).collect()
    by_sh = {r["sh"]: r for r in out}
    hot = by_sh["all rights reserved"]
    assert hot["df"] == 20 and abs(hot["frac"] - 0.8) < 1e-9
    assert by_sh["fresh0 novel0 content0"]["df"] == 1


def test_boilerplate_fraction_separates_template_docs(template_docs):
    out = boilerplate_fraction(
        template_docs, "doc_id", "text", n=3, max_frac=0.5
    ).collect()
    fracs = {r["id"]: r["boiler_frac"] for r in out}
    # template docs: shingles "words here all", "here all rights",
    # "all rights reserved", "rights reserved worldwide" are in 20/25 docs
    assert fracs[0] > 0.5
    assert fracs[100] == 0.0


# --- Gopher flags -----------------------------------------------------------


def test_gopher_flags_rule_by_rule(spark):
    rows = [
        (1, "too short"),                                    # fails word count
        (2, " ".join(["the", "of", "a", "to", "word", "nice"] * 10)),  # passes all
        (3, " ".join(["spam"] * 40)),                        # fails top-word + stopwords
        (4, " ".join(["pneumonoultramicroscopicsilicovolcanoconiosis"] * 18 + ["the", "of"])),  # fails mean wl
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    assert not got[1]["ok_word_count"]
    assert got[2]["pass_all"]
    assert not got[3]["ok_top_word"] and not got[3]["ok_stopwords"]
    assert not got[4]["ok_mean_word_len"]


# --- temperature mixing -----------------------------------------------------


def test_temperature_mix_sqrt_proportions(spark):
    # 3 groups with 6400 / 1600 / 400 rows -> keep rates sqrt(400/n):
    # 0.25 / 0.5 / 1.0 -> kept ~ 1600 / 800 / 400 (2:1 ratios = sqrt flattening)
    rows = (
        [(i, "big") for i in range(6400)]
        + [(10_000 + i, "mid") for i in range(1600)]
        + [(20_000 + i, "small") for i in range(400)]
    )
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = (
        temperature_mix(df, "id", "lang", seed=7)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["lang"]: r["n"] for r in kept.collect()}
    assert got["small"] == 400  # smallest group keeps everything
    assert abs(got["mid"] - 800) < 80, got
    assert abs(got["big"] - 1600) < 120, got
    # α = 0.5 flattening: the 16:4:1 input becomes ~4:2:1 kept
    assert 1.7 < got["big"] / got["mid"] < 2.3


def test_temperature_mix_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, lang string")
    a = sorted(r["id"] for r in temperature_mix(df, "id", "lang", seed=5).collect())
    b = sorted(r["id"] for r in temperature_mix(df, "id", "lang", seed=5).collect())
    assert a == b


def test_temperature_mix_plan_corpus_never_shuffles(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = temperature_mix(df, "id", "lang", seed=5)
    plan = explain_str(out, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# --- empty-input pinning (repo convention: empty in -> empty/zero out,
# never an exception) --------------------------------------------------------


def test_new_operators_empty_inputs(spark):
    from spark_ifs_spark.operators.sketches import hll_distinct

    empty_baskets = spark.createDataFrame([], "basket int, item string")
    assert co_occurrence_pairs(empty_baskets, "basket", "item").count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert shingle_doc_freq(empty_docs, "doc_id", "text").count() == 0
    assert boilerplate_fraction(empty_docs, "doc_id", "text").count() == 0
    assert gopher_quality_flags(empty_docs, "doc_id", "text").count() == 0

    empty_lang = spark.createDataFrame([], "id long, lang string")
    assert temperature_mix(empty_lang, "id", "lang").count() == 0

    empty_ev = spark.createDataFrame([], "event_type string, user_id long")
    assert hll_distinct(empty_ev, ["event_type"], "user_id").count() == 0

    # bloom decontam: empty corpus and empty eval set both yield zero ids
    docs = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    assert contaminated_ids_bloom(empty_docs, docs, "doc_id", "text", n=3).count() == 0
    assert contaminated_ids_bloom(docs, empty_docs, "doc_id", "text", n=3).count() == 0


# --- adversarial skew -------------------------------------------------------


def test_boilerplate_universal_shingle_stays_linear(spark):
    """A shingle present in EVERY doc must not blow up the join: its
    fan-out equals its df (each doc carries it once), so the joined
    relation stays linear in the corpus — and every doc scores it as
    boilerplate."""
    rows = [(i, f"common boiler plate text unique{i} tail{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_fraction(df, "doc_id", "text", n=3, max_frac=0.5).collect()
    assert len(out) == 300
    # "common boiler plate" and "boiler plate text" are universal (df=300);
    # each doc has 4 shingles total -> boiler_frac = 2/4
    for r in out:
        assert r["n_boiler"] == 2 and abs(r["boiler_frac"] - 0.5) < 1e-9


def test_temperature_mix_extreme_skew_exact_rates(spark):
    """10000:1 skew: keep rate for the giant group is sqrt(1/10000) =
    1% — the kept count must land within binomial noise of 100, and the
    singleton group must survive."""
    rows = [(i, "giant") for i in range(10_000)] + [(10**7, "rare")]
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = temperature_mix(df, "id", "lang", seed=3).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in kept.collect()}
    assert got.get("rare", 0) == 1
    assert 60 <= got["giant"] <= 140, got


def test_hll_single_hot_key_many_values(spark):
    from spark_ifs_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("hot", i) for i in range(20_000)] + [("cold", 1)],
        "key string, v long",
    )
    got = {r["key"]: r["est_distinct"] for r in hll_distinct(df, ["key"], "v", p=9).collect()}
    assert abs(got["hot"] - 20_000) / 20_000 < 0.15
    assert abs(got["cold"] - 1) < 0.5
