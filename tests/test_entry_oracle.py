"""Local replica of the driver's correctness gate: run every registered
Spark query AND its DuckDB oracle at sf0.001, compare row count, schema
(column names), and an order-insensitive value hash.

This is the strongest test in the suite — if it is green here, the
driver's CORRECTNESS_r{N}.json should be green at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_cell)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_oracle_or_reason(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15


def _oracle_names() -> list[str]:
    # parameterize from the registry so every new oracle-backed query is
    # gated automatically (a hard-coded list silently skips new entries)
    from spark_ifs_spark.registry import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, duck, entry_mod, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = q(spark, sf_dir).toPandas()
    want = duck.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"schema mismatch: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    # dtype-CLASS must agree: a Spark int64 vs a DuckDB float64 (HUGEINT
    # sums come back as floats) passes _canon here but fails the
    # driver's value hash — cast the oracle (e.g. CAST(sum(x) AS
    # BIGINT)) rather than loosening this.
    def _cls(dt) -> str:
        s = str(dt)
        return "float" if "float" in s else ("int" if "int" in s else s)

    for c in got.columns:
        assert _cls(got[c].dtype) == _cls(want[c].dtype), (
            f"dtype class mismatch on {c}: spark={got[c].dtype} oracle={want[c].dtype}"
        )
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff = (g != w).any(axis=1)
        raise AssertionError(
            f"value mismatch in {name}; first differing rows:\n"
            f"spark:\n{g[diff].head(5)}\noracle:\n{w[diff].head(5)}"
        )


def test_driver_window_frozen():
    """The driver's CORRECTNESS gate reads the FIRST 50 QUERIES keys.
    Round 11 rotated the window to: the five never-driver-gated
    round-10 additions, then the 23 keys whose freshest driver row
    was round 6, then the 22 least-recently-gated r7 keys — after
    this gate every registered key has a driver row and none is
    fresher-bounded below round 7. Any accidental reorder (new
    entries must APPEND once the window is final) fails here before
    it silently changes what the driver verifies."""
    from spark_ifs_spark.registry import ORACLES, QUERIES
    from spark_ifs_spark.registry._order import ORDER

    assert list(QUERIES) == ORDER
    assert list(ORACLES) == ORDER
    assert list(QUERIES)[:50] == [
        # never-gated round-10 additions
        "facility_select_k5", "ab_cuped", "curriculum_manifest",
        "join_skew_plan", "knn_centrality",
        # r6-era backfill (all 23 keys whose freshest row was round 6)
        "ann_ivfpq_trained_audit", "collapse_repeats", "multimodal_jpeg_features",
        "audio_mulaw_features", "dedup_substring_runs", "jmi_select_k5",
        "cmim_select_k5", "word_triangles", "dedup_jaccard_prefix",
        "dsir_select", "dedup_containment", "shard_manifest",
        "maxsim_topk", "hybrid_rrf", "ppl_buckets",
        "token_budget_alloc", "doc_novelty", "zipf_fit",
        "embedding_effective_dim", "retrieval_eval_rrf", "corpus_report",
        "ccnet_mix", "knn_label_accuracy",
        # oldest r7-era block (22 keys)
        "unigram_lm_vocab", "doremi_weights", "url_dedup",
        "mrmr_k10_synthetic", "unigram_token_counts", "doremi_mix",
        "tokenizer_fertility", "unigram_doc_tokens", "pref_bt_ratings",
        "split_psi", "bootstrap_doclen_ci", "lm_kn_logprob",
        "dedup_substring_removal", "events_user_stats", "pipeline_end_to_end",
        "dup_clusters", "kmeans_step", "embedding_top_pairs",
        "text_token_counts", "text_quality", "text_repetition",
        "corpus_clean",
    ]