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
    Round 12 rotated the window to: the seven never-driver-gated
    round-11 additions, then the 43 least-recently-gated keys
    (freshest driver row = round 7) — after this gate every
    registered key has a driver row and none is fresher-bounded
    below round 8. Any accidental reorder (new entries must APPEND
    once the window is final) fails here before it silently changes
    what the driver verifies."""
    from spark_ifs_spark.registry import ORACLES, QUERIES
    from spark_ifs_spark.registry._order import ORDER

    assert list(QUERIES) == ORDER
    assert list(ORACLES) == ORDER
    assert list(QUERIES)[:50] == [
        # never-gated round-11 additions
        "ann_topk_graph", "ann_graph_recall_audit", "dedup_phash",
        "cms_heavy_hitters", "quantile_sample_audit", "multimodal_frame_sample",
        "sft_pack",
        # least-recently-gated backlog (freshest driver row = round 7)
        "vocab_top50", "lang_id",
        "doc_fingerprint", "multimodal_features", "lineitem_pricing",
        "nation_revenue", "priority_orders", "events_topk_per_type",
        "events_asof_signup", "events_attribution", "events_rolling_7d",
        "supplier_diversity", "split_counts", "docs_cap_per_source",
        "scrub_pii", "doc_chunks", "packed_bins",
        "decontam_ids", "tfidf_top3", "doc_length_quantiles",
        "mix_by_source", "textrank_keywords", "event_transitions",
        "docs_weighted_sample", "events_funnel", "events_cohorts",
        "events_scd2", "cms_term_counts", "join_size_estimate",
        "quality_calibration", "label_agreement_kappa", "ngram_coverage_curve",
        "dedup_cluster_purity", "packing_waste_curve", "heaps_law_fit",
        "quality_threshold_sweep", "dedup_retention", "readability_scores",
        "source_centroid_sim", "zorder_layout", "priority_sample",
        "kmv_distinct_sources", "winnow_pairs",
    ]