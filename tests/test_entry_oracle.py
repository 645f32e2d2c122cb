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
    Round 9 rotated the window to: the five round-9 additions, then
    the 45 least-recently-gated keys — the seventeen r4-era keys the
    r8 window displaced, the nine r4-era keys from round 7's old
    positions 51-59, and the oldest r5-era block — so after this gate
    no key's freshest driver row is older than round 5. Any accidental
    reorder (new entries must APPEND once the window is final) fails
    here before it silently changes what the driver verifies."""
    from spark_ifs_spark.registry import ORACLES, QUERIES
    from spark_ifs_spark.registry._order import ORDER

    assert list(QUERIES) == ORDER
    assert list(ORACLES) == ORDER
    assert list(QUERIES)[:50] == [
        # round-9 additions
        "knn_graph", "knn_graph_recall", "knn_graph_components", "packing_assignment", "coverage_select_k5",
        # r4-era backfill (the 26 keys displaced across r7/r8)
        "docs_profile", "events_rollup", "docs_length_deciles", "events_type_pivot",
        "corpus_diff", "events_props_json", "unconverted_views", "events_cube",
        "session_journeys", "supplier_zscore", "monthly_growth", "events_daily_anomaly",
        "customer_rfm", "forecast_revenue", "late_suppliers", "part_pair_counts",
        "decontam_bloom", "pmi_top_pairs", "quality_lr_score", "market_share",
        "custdist", "big_volume_customers", "widget_part_suppliers", "decontam_overlap",
        "bm25_topk", "tfidf_cosine_pairs",
        # oldest r5-era block
        "boilerplate_shingles", "docs_novelty", "docs_temperature_mix", "gopher_filters",
        "split_leakage", "cluster_size_stats", "ann_recall_audit", "events_hll_users",
        "docs_profile_sketch", "source_quality_report", "user_streaks", "weighted_median_price",
        "lineitem_corr", "part_pair_lift", "kwic_snippets", "events_interarrival",
        "events_value_histogram", "lang_source_chisq", "source_token_entropy",
    ]
