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
    Round 13 rotated the window to: the six never-driver-gated
    round-12 additions, then the 35 keys whose freshest driver row
    was round 8, then the 9 oldest round-9 keys — after this gate
    every registered key has a driver row and none is
    fresher-bounded below round 9. Any accidental reorder (new
    entries must APPEND once the window is final) fails here before
    it silently changes what the driver verifies."""
    from spark_ifs_spark.registry import ORACLES, QUERIES
    from spark_ifs_spark.registry._order import ORDER

    assert list(QUERIES) == ORDER
    assert list(ORACLES) == ORDER
    assert list(QUERIES)[:50] == [
        # never-gated round-12 additions
        "rank_sketch_quantiles", "mg_heavy_hitters", "heavy_hitter_cross_audit",
        "cross_modal_dedup", "kmv_source_overlap", "source_length_quantiles_sketch",
        # least-recently-gated backlog (freshest driver row = round 8)
        "winnow_fingerprints", "shard_dup_coverage", "minhash_recall_audit",
        "c4_line_filters", "c4_line_dedup", "kmeans_train",
        "tokenizer_compare", "dedup_source_matrix", "pref_pl_ratings",
        "ann_topk_sq8", "dedup_exact_normalized", "pipeline_audit",
        "dedup_fuzzy_edit", "ann_topk_ivf_trained", "nation_trade_volume",
        "bracket_revenue", "top_supplier", "bpe_pairs_top50",
        "bpe_train_merges", "bpe_token_counts", "embedding_gram",
        "pca_power_step", "pca_power_iter2", "shipping_priority",
        "returned_revenue", "order_priority_mix", "promo_revenue",
        "small_order_revenue", "idle_customers", "lm_bigram_logprob",
        "embedding_project", "source_overlap", "events_latest_state",
        "docs_sample_n", "events_winsorized",
        # oldest round-9 keys
        "knn_graph", "knn_graph_recall", "knn_graph_components",
        "packing_assignment", "coverage_select_k5", "docs_profile",
        "events_rollup", "docs_length_deciles", "events_type_pivot",
    ]
