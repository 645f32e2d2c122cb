from __future__ import annotations

import hashlib

import pytest

from spark_ifs_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "el perro corre en la calle de la ciudad"),
        (2, "a b c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_counts(spark, docs):
    out = {r["id"]: r for r in textstats.token_counts(docs, "doc_id", "text").collect()}
    assert out[0]["n_ws_tokens"] == 4
    assert out[0]["n_re_tokens"] == 4
    assert out[0]["n_chars"] == len("the quick brown fox")
    assert out[2]["n_ws_tokens"] == 3


def test_quality_score_bounds(spark, docs):
    for r in textstats.quality_score(docs, "doc_id", "text").collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_words"] > 0


def test_lang_id(spark, docs):
    out = {r["id"]: r["pred_lang"] for r in textstats.lang_id(docs, "doc_id", "text").collect()}
    assert out[0] == "en"  # 'the' marker
    assert out[1] == "es"  # 'el'/'la'/'de' markers
    assert out[2] == "en"  # 'a' marker
    assert set(out.values()) <= set(textstats.LANG_MARKERS)


def test_fingerprint_normalization(spark):
    rows = [(0, "Hello, World!"), (1, "hello   world"), (2, "HELLO-WORLD"), (3, "different")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r["fp"] for r in textstats.fingerprint(df, "doc_id", "text").collect()}
    assert out[0] == out[1] == out[2]  # same content modulo formatting
    assert out[0] != out[3]
    assert out[0] == hashlib.md5(b"hello world").hexdigest()


def test_rolling_fingerprints(spark):
    df = spark.createDataFrame([(0, "abcdefghij" * 5)], ["doc_id", "text"])
    out = textstats.rolling_fingerprints(df, "doc_id", "text", window=10).collect()
    fps = {r["pos"]: r["fp"] for r in out}
    # period-10 text: windows 10 apart hash identically
    assert fps[0] == fps[10] == fps[20]
    assert fps[0] != fps[1]
    # every valid start position, INCLUDING the final one (n - window)
    assert sorted(fps) == list(range(41))
    assert fps[30] == fps[40] == fps[0]


def test_rolling_fingerprints_short_and_exact_docs(spark):
    # shorter than the window -> zero rows (not a runtime error);
    # exactly the window -> exactly one fingerprint at pos 0
    df = spark.createDataFrame(
        [(0, "short"), (1, "abcdefghij"), (2, "")], ["doc_id", "text"]
    )
    out = textstats.rolling_fingerprints(df, "doc_id", "text", window=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["pos"])
    assert 0 not in by_id and 2 not in by_id
    assert by_id[1] == [0]


def test_adjacent_pair_counts_bigram_semantics(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x"), (3, None)],
        ["doc_id", "text"],
    )
    out = textstats.adjacent_pair_counts(df, "text", top_n=10).collect()
    got = {r["pair"]: r["n"] for r in out}
    # doc0: (a b)(b a)(a b)(b c); doc1: (a b); doc2/3: no pairs
    assert got == {"a b": 3, "b a": 1, "b c": 1}
    # deterministic total order at the cut
    assert [r["pair"] for r in out] == ["a b", "b a", "b c"]


def test_adjacent_pair_counts_single_shuffle(spark):
    from spark_ifs_spark.plans.checks import count_exchanges

    df = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    # pair construction is map-side: the only exchange feeds the count
    # aggregate (TakeOrdered adds no sort shuffle)
    assert count_exchanges(textstats.adjacent_pair_counts(df, "text")) <= 1


def test_bigram_logprob_tiny_corpus(spark):
    """Hand-checked scores: model trained on the corpus itself,
    ln(c_pair/c_left) quantized to micronats."""
    import math

    from spark_ifs_spark.operators.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a c")], "id long, text string"
    )
    # corpus bigrams: doc1: (a b), (b a), (a b); doc2: (a b), (b a), (a c)
    # c_pair: (a b)=3, (b a)=2, (a c)=1 ; c_left: a·=4, b·=2
    t_ab = math.floor(math.log(3 / 4) * 1e6)
    t_ba = math.floor(math.log(2 / 2) * 1e6)
    t_ac = math.floor(math.log(1 / 4) * 1e6)
    got = {r["id"]: (r["n_bigrams"], r["ll_micronats"]) for r in
           bigram_logprob(df, "id", "text").collect()}
    assert got == {
        1: (3, 2 * t_ab + t_ba),
        2: (3, t_ab + t_ba + t_ac),
    }


def test_source_vocab_overlap_tiny(spark):
    from spark_ifs_spark.operators.textstats import source_vocab_overlap

    df = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "b c d"), ("s3", "x")],
        "source string, text string",
    )
    rows = {
        (r["src_a"], r["src_b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in source_vocab_overlap(df, "source", "text").collect()
    }
    # s1∩s2={b,c}: 2/(3+3-2)=0.5 ; s3 shares nothing → no rows emitted
    assert rows == {("s1", "s2"): (2, 3, 3, 0.5)}


def test_approx_percentile_swap_within_tolerance(spark, sf_dir):
    """SCALE.md names approx_percentile as the drop-in for the exact
    per-group quantiles at corpus scale — show the swap actually lands
    within its accuracy contract on real data (same plan shape, one
    grouped aggregate)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r["lang"]: r["p"]
        for r in docs.groupBy("lang")
        .agg(F.expr("percentile(n_chars, 0.9)").alias("p"))
        .collect()
    }
    approx = {
        r["lang"]: r["p"]
        for r in docs.groupBy("lang")
        .agg(F.expr("approx_percentile(n_chars, 0.9, 1000)").alias("p"))
        .collect()
    }
    assert set(exact) == set(approx)
    for lang, p in exact.items():
        assert abs(approx[lang] - p) <= max(0.05 * p, 1.0), (lang, p, approx[lang])


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """The HLL++ swap for exact distinct counts (vocabulary size, user
    counts) at corpus scale — pin its rsd contract on real data."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("t")).filter("t <> ''")
    exact = toks.select(F.countDistinct("t").alias("n")).first()["n"]
    approx = toks.select(F.approx_count_distinct("t", 0.02).alias("n")).first()["n"]
    assert abs(approx - exact) <= max(0.06 * exact, 5), (exact, approx)


def test_bm25_prefers_rare_term_and_caps_k(spark):
    rows = [
        (0, "spark spark spark runs fast"),
        (1, "spark runs on a cluster"),
        (2, "the cat sat on the mat"),
        (3, "cluster of stars in the sky"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.bm25_topk(df, "doc_id", "text", ["spark", "cluster"], k=3).collect()
    assert len(out) == 3
    ids = [r["id"] for r in out]
    assert 2 not in ids  # no query term at all
    # tf saturation (k1) means doc 1's two distinct query terms beat
    # doc 0's tf=3 on one term; doc 0 still outranks single-term doc 3
    assert ids[0] == 1
    assert ids.index(0) < ids.index(3)
    # scores strictly ordered desc, ties impossible here
    scores = [r["score_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_novelty_scores_unique_vs_shared(spark):
    rows = [
        (1, "alpha beta gamma delta"),      # shares all shingles with doc 2
        (2, "alpha beta gamma delta"),
        (3, "unique phrase only here now"), # every shingle df=1
        (4, "xy"),                          # < 3 tokens -> no shingles
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in textstats.novelty_scores(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty_ppm"] == 0 and out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1000000
    assert out[3]["n_shingles"] == 3 and out[3]["n_novel"] == 3


def test_zipf_fit_recovers_planted_slope(spark):
    """A synthetic corpus with freq(rank) = round(1000 * rank^-1) must
    fit slope ~ -1 with high r2."""
    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * max(1, round(1000 / rank))
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    row = textstats.zipf_fit(df, "doc_id", "text", top_n=50).collect()[0]
    assert row["n_terms"] == 50
    assert row["vocab_size"] == 50
    assert row["top_freq"] == 1000
    assert abs(row["slope"] + 1.0) < 0.05
    assert row["r2"] > 0.99


def test_ppl_buckets_partition_and_order(spark):
    """Buckets partition the scored docs; head holds strictly lower
    (better) ppl than tail; single-token docs carry no LM evidence."""
    # all docs share left context 'a' (c_a = 8): p(x|a)=1/2 -> ppl
    # ln2, p(y|a)=1/4 -> ln4, p(z|a)=p(w|a)=1/8 -> ln8 (graded)
    rows = (
        [(i, "a x") for i in range(4)]
        + [(10, "a y"), (11, "a y"), (20, "a z"), (21, "a w")]
        + [(99, "singleton")]  # zero bigrams -> excluded
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["bucket"]: r for r in textstats.ppl_buckets(df, "doc_id", "text").collect()}
    assert {b: r["n_docs"] for b, r in out.items()} == {
        "head": 4, "middle": 2, "tail": 2,
    }  # singleton excluded, tertiles split at the graded values
    assert (
        out["head"]["max_ppl_micro"]
        <= out["middle"]["min_ppl_micro"]
        <= out["middle"]["max_ppl_micro"]
        <= out["tail"]["min_ppl_micro"]
    )


def test_bm25_multi_matches_per_query_runs(spark):
    """bm25_multi_topk (one scan, Q queries) is bit-identical to Q
    independent bm25_topk runs — same integer-micro scores, same order."""
    rows = [
        (0, "spark spark spark runs fast"),
        (1, "spark runs on a cluster"),
        (2, "the cat sat on the mat"),
        (3, "cluster of stars in the sky"),
        (4, "a mat on a mat near the cat"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    queries = {"qa": ["spark", "cluster"], "qb": ["cat", "mat"]}
    multi = textstats.bm25_multi_topk(df, "doc_id", "text", queries, k=3).collect()
    for qname, terms in queries.items():
        single = textstats.bm25_topk(df, "doc_id", "text", terms, k=3).collect()
        got = sorted(
            (r["rank"], r["id"], r["score_micro"])
            for r in multi if r["query"] == qname
        )
        want = [(i + 1, r["id"], r["score_micro"]) for i, r in enumerate(single)]
        assert got == sorted(want), qname


def test_bm25_length_normalization(spark):
    # same tf, longer doc scores lower under b > 0
    rows = [
        (0, "spark is neat"),
        (1, "spark " + "filler " * 30 + "end"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r["score_micro"] for r in textstats.bm25_topk(df, "doc_id", "text", ["spark"], k=10).collect()}
    assert out[0] > out[1]


def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.5, max_df=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["cos_sim"] == 1.0


def test_tfidf_cosine_pairs_df_pruning_drops_stop_terms(spark):
    # 'common' appears in every doc; with max_df=2 it is pruned from the
    # vector space entirely, so the docs share nothing and no pair emerges
    rows = [
        (0, "common alpha"),
        (1, "common beta"),
        (2, "common gamma"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert (
        textstats.tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.1, max_df=2).count()
        == 0
    )


def test_pmi_top_pairs_prefers_exclusive_collocation(spark):
    # "new york" always co-occur exclusively; "the cat" words appear in
    # many other contexts -> PMI(new york) > PMI(the cat)
    rows = [
        (0, "new york new york new york new york new york"),
        (1, "the cat the dog the bird the cat the fish"),
        (2, "cat and dog and bird and fish and the"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.pmi_top_pairs(df, "text", k=5, min_count=2)
    rowsc = out.collect()
    pmis = {r["pair"]: r["pmi_micro"] for r in rowsc}
    assert "new york" in pmis
    assert pmis["new york"] == max(pmis.values())
    # deterministic total order
    keys = [(-r["pmi_micro"], r["pair"]) for r in rowsc]
    assert keys == sorted(keys)


def test_pmi_min_count_filters_hapax_pairs(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h")], ["doc_id", "text"]
    )  # every pair occurs once
    assert textstats.pmi_top_pairs(df, "text", k=10, min_count=2).count() == 0


def test_tfidf_pairs_stop_term_stays_subquadratic(spark):
    """Adversarial: one term in 50% of docs. With the DF cap it must be
    pruned from the vector space, so the candidate join sees only the
    rare discriminative terms — pair volume stays bounded by true
    near-dups, not by the stop term's quadratic fan-out."""
    from spark_ifs_spark.operators import textstats

    n = 400
    rows = []
    for i in range(n):
        stop = "common " if i % 2 == 0 else ""
        rows.append((i, f"{stop}unique{i} filler{i % 50}"))
    # plus one true near-dup pair sharing a rare term
    rows += [(1000, "rareterm alpha"), (1001, "rareterm alpha")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.9, max_df=50
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1000, 1001) in pairs
    # 'common' (df=200 > 50) pruned: without the cap it alone would
    # produce C(200,2)=19900 candidate pairs; the filler groups (df=8)
    # bound what remains
    assert len(pairs) < 300


def test_poisson_bootstrap_ci_brackets_point_and_is_deterministic(spark, sf_dir):
    from spark_ifs_spark.operators.textstats import (
        POISSON1_CDF_PPM,
        poisson_bootstrap_mean_ci,
    )
    from spark_ifs_spark.sources.parquet import load_table

    # the injected CDF is the Poisson(1) law
    import math

    assert POISSON1_CDF_PPM[0] == math.floor(math.exp(-1) * 1e6)
    assert POISSON1_CDF_PPM[-1] >= 999998  # CDF(8) covers all but ~1e-6

    docs = load_table(spark, sf_dir, "documents")
    r1 = poisson_bootstrap_mean_ci(docs, "doc_id", "n_chars").collect()[0]
    r2 = poisson_bootstrap_mean_ci(docs, "doc_id", "n_chars").collect()[0]
    assert tuple(r1) == tuple(r2)  # deterministic
    assert r1["ci_lo"] <= r1["point_mean"] <= r1["ci_hi"]
    assert r1["n_replicas"] == 64
    # CI width shrinks for a constant column to ~0
    const = docs.selectExpr("doc_id", "100 AS v")
    rc = poisson_bootstrap_mean_ci(const, "doc_id", "v").collect()[0]
    assert rc["ci_lo"] == rc["ci_hi"] == rc["point_mean"] == 100.0


def test_kneser_ney_properties(spark):
    """KN conditionals over observed continuations sum to < 1 (mass
    reserved for unseen words), and per-doc bigram counts match the
    ML-estimate scorer's."""
    import math

    from spark_ifs_spark.operators.textstats import (
        bigram_logprob,
        kneser_ney_logprob,
    )

    rows = [(1, "a b a b a c"), (2, "b a b c a b"), (3, "c a c b a a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kn = {r["id"]: (r["n_bigrams"], r["ll_micronats"])
          for r in kneser_ney_logprob(df, "doc_id", "text").collect()}
    ml = {r["id"]: (r["n_bigrams"], r["ll_micronats"])
          for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert {k: v[0] for k, v in kn.items()} == {k: v[0] for k, v in ml.items()}
    assert any(kn[k][1] != ml[k][1] for k in kn)  # smoothing changes scores

    # normalization check, hand-computed model from the same corpus
    pairs = {}
    for _, t in rows:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    d = 0.75
    lefts = {}
    n1l, n1r = {}, {}
    for (a, b), c in pairs.items():
        lefts[a] = lefts.get(a, 0) + c
        n1l[a] = n1l.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    np_ = len(pairs)
    for v in lefts:
        obs = sum(
            (c - d) / lefts[v] + (d * n1l[v] / lefts[v]) * (n1r[b] / np_)
            for (a, b), c in pairs.items()
            if a == v
        )
        assert obs < 1.0 + 1e-12
        # full normalization: adding unseen-continuation mass ~ sums to 1
        full = sum(
            max(pairs.get((v, b), 0) - d, 0.0) / lefts[v]
            + (d * n1l[v] / lefts[v]) * (n1r[b] / np_)
            for b in n1r
        )
        assert abs(full - 1.0) < 1e-9


def test_ppl_doc_buckets_ll_injection_identical(spark, sf_dir):
    """Injecting a prebuilt ll relation must reproduce the inline run
    bit-for-bit (the session-staging contract)."""
    from spark_ifs_spark.operators.textstats import (
        bigram_logprob,
        ppl_doc_buckets,
    )
    from spark_ifs_spark.registry._common import _read

    docs = _read(spark, sf_dir, "documents")
    inline = ppl_doc_buckets(docs, "doc_id", "text")
    injected = ppl_doc_buckets(
        docs, "doc_id", "text", ll=bigram_logprob(docs, "doc_id", "text")
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, injected.collect())
    )
