"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full JSON report line {"metric", "value", "unit", "queries", "sf"} followed
by a compact summary line (total/n/errors/config) that survives the
driver's 2000-char tail truncation; the full report is also written to
the untracked bench_out.json (or to the canonical, committed
bench_full.json when SPARK_GRAFT_BENCH_CANONICAL=1 — builder round-end
runs only, so driver verify reruns never dirty the committed vector).

Mirrors BASELINE.md's protocol: B1 round-1 relevance, B2/B3 full greedy
mRMR in both encodings (+ the reference CLI's cross-encoding identity
check as a hard assert), B4 synthetic 10k×50 matrix selection, plus the
pipeline-extension headliners (minhash dedup, ann, simhash, text stats,
events windows, pricing scan-agg).

Failure protocol (round 2's bench crashed mid-run and published nothing,
costing a full round of perf signal): every query runs in its own
try/except, a failing query records an ``errors[name]`` message instead
of aborting the run, the JSON line is ALWAYS printed (partial timings
included), and the exit code is nonzero iff anything failed — so a crash
is loud but never silent about the queries that did complete.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "unigram_lm_vocab",
    "unigram_token_counts",
    "doremi_weights",
    "doremi_mix",
    "tokenizer_fertility",
    "unigram_doc_tokens",
    "pref_bt_ratings",
    "split_psi",
    "bootstrap_doclen_ci",
    "lm_kn_logprob",
    "dedup_substring_removal",
    "url_dedup",
    "mrmr_k10_synthetic",
    "mi_pair_lineitem",
    "mrmr_top1",
    "mi_relevance",          # B1
    "mi_matrix",
    "mrmr_select_k5",        # B2 (conventional, embeddings)
    "mrmr_miq_k5",
    "row_select_k5",         # B3 (alternate, embeddings)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_fuzzy_edit",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_embedding_bucketed",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_recall",
    "dedup_embedding_lsh_hi",
    "dedup_embedding_lsh_hi_audit",
    "multimodal_png_features",
    "multimodal_jpeg_features",
    "audio_mulaw_features",
    "dedup_substring_runs",
    "jmi_select_k5",
    "cmim_select_k5",
    "word_triangles",
    "dedup_jaccard_prefix",
    "dsir_select",
    "dedup_containment",
    "shard_manifest",
    "maxsim_topk",
    "hybrid_rrf",
    "ppl_buckets",
    "token_budget_alloc",
    "doc_novelty",
    "zipf_fit",
    "embedding_effective_dim",
    "retrieval_eval_rrf",
    "corpus_report",
    "ccnet_mix",
    "knn_label_accuracy",
    "c4_line_filters",
    "c4_line_dedup",
    "kmeans_train",
    "tokenizer_compare",
    "dedup_source_matrix",
    "pref_pl_ratings",
    "minhash_recall_audit",
    "winnow_fingerprints",
    "shard_dup_coverage",
    "join_size_estimate",
    "quality_calibration",
    "label_agreement_kappa",
    "ngram_coverage_curve",
    "dedup_cluster_purity",
    "packing_waste_curve",
    "packing_assignment",
    "coverage_select_k5",
    "heaps_law_fit",
    "quality_threshold_sweep",
    "dedup_retention",
    "readability_scores",
    "source_centroid_sim",
    "zorder_layout",
    "priority_sample",
    "kmv_distinct_sources",
    "winnow_pairs",
    "knn_graph",
    "knn_graph_recall",
    "knn_graph_components",
    "graph_diversity_select_k5",
    "knn_label_prop",
    "epoch_shuffle_manifest",
    "facility_select_k5",
    "ab_cuped",
    "curriculum_manifest",
    "join_skew_plan",
    "knn_centrality",
    "ann_ivfpq_trained_audit",
    "collapse_repeats",
    "ann_topk_pq",
    "semantic_dedup",
    "events_user_stats_tws",
    "ann_topk_ivfpq",
    "cluster_aware_split",
    "doc_chunks_udtf",
    "ann_pq_recall_audit",
    "hard_negatives",
    "session_concurrency",
    "negative_samples",
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_ivf_trained",
    "ann_topk_lsh",
    "embedding_top_pairs",
    "text_token_counts",
    "text_quality",
    "text_repetition",
    "corpus_clean",
    "vocab_top50",
    "lang_id",
    "doc_fingerprint",
    "multimodal_features",
    "events_daily",
    "events_sessionize",
    "events_user_stats",
    "lineitem_pricing",
    "nation_revenue",
    "priority_orders",
    "shipping_priority",
    "returned_revenue",
    "events_topk_per_type",
    "events_asof_signup",
    "events_attribution",
    "events_rolling_7d",
    "supplier_diversity",
    "split_counts",
    "docs_cap_per_source",
    "scrub_pii",
    "doc_chunks",
    "packed_bins",
    "decontam_ids",
    "tfidf_top3",
    "doc_length_quantiles",
    "kmeans_step",
    "dup_clusters",
    "dedup_spans",
    "dedup_incremental",
    "pipeline_end_to_end",
    "pipeline_audit",
    "mix_by_source",
    "bpe_pairs_top50",
    "bpe_train_merges",
    "bpe_token_counts",
    "embedding_gram",
    "pca_power_step",
    "pca_power_iter2",
    "order_priority_mix",
    "nation_trade_volume",
    "bracket_revenue",
    "top_supplier",
    "promo_revenue",
    "small_order_revenue",
    "idle_customers",
    "lm_bigram_logprob",
    "embedding_project",
    "source_overlap",
    "events_latest_state",
    "docs_sample_n",
    "events_winsorized",
    "docs_profile",
    "events_rollup",
    "docs_length_deciles",
    "events_type_pivot",
    "corpus_diff",
    "events_props_json",
    "unconverted_views",
    "events_cube",
    "market_share",
    "custdist",
    "big_volume_customers",
    "widget_part_suppliers",
    "decontam_overlap",
    "bm25_topk",
    "tfidf_cosine_pairs",
    "ann_topk_sq8",
    "dedup_exact_normalized",
    "cms_term_counts",
    "pmi_top_pairs",
    "quality_lr_score",
    "events_funnel",
    "events_cohorts",
    "events_scd2",
    "event_transitions",
    "docs_weighted_sample",
    "textrank_keywords",
    "session_journeys",
    "supplier_zscore",
    "monthly_growth",
    "events_daily_anomaly",
    "customer_rfm",
    "forecast_revenue",
    "late_suppliers",
    "part_pair_counts",
    "decontam_bloom",
    "boilerplate_shingles",
    "docs_novelty",
    "docs_temperature_mix",
    "gopher_filters",
    "split_leakage",
    "cluster_size_stats",
    "ann_recall_audit",
    "events_hll_users",
    "docs_profile_sketch",
    "source_quality_report",
    "user_streaks",
    "weighted_median_price",
    "lineitem_corr",
    "part_pair_lift",
    "kwic_snippets",
    "events_interarrival",
    "events_value_histogram",
    "lang_source_chisq",
    "source_token_entropy",
    "user_value_twa",
    "orders_sla",
    "events_rolling_7d_users",
    "events_autocorr7",
    "source_size_gini",
    "supplier_mad_outliers",
    "langid_confusion",
    "funnel_latency",
    "events_imputed",
    "events_value_pcts_hist",
    "cluster_representatives",
    "benford_first_digit",
    "ann_topk_graph",
    "ann_graph_recall_audit",
    "dedup_phash",
    "cms_heavy_hitters",
    "quantile_sample_audit",
    "multimodal_frame_sample",
    "sft_pack",
    "rank_sketch_quantiles",
    "mg_heavy_hitters",
    "heavy_hitter_cross_audit",
    "cross_modal_dedup",
    "kmv_source_overlap",
    "source_length_quantiles_sketch",
    "dedup_audio_fp",
    "audio_fp_recall_audit",
    "quantile_cross_audit",
    "distinct_cross_audit",
    "overlap_cross_audit",
]


def run_queries(
    spark, sf_dir: str, queries, names: list[str], repeats: int = 2
) -> tuple[dict[str, float], dict[str, list], dict[str, str]]:
    """Time each named query (min-of-``repeats``), isolating failures.

    Returns ``(timings, results, errors)`` — a query that raises on any
    repeat lands in ``errors`` (first line of the exception, for the JSON
    report) and in neither other dict; the remaining queries still run.

    min-of-2 per query (the protocol B5 always used, extended to every
    entry in round 2): timings in one long shared local[32] session are
    contention/GC-noisy (observed 2-5x swings on identical plans) and
    the first few entries otherwise absorb JVM + parquet-footer warmup
    that is not query cost. The min is the reproducible per-query
    number; correctness asserts (B4) still check the collected rows.
    """
    timings: dict[str, float] = {}
    results: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = float("inf")
        try:
            for _ in range(repeats):
                t0 = time.perf_counter()
                rows = queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # isolate: one bad query must not kill the run
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
            traceback.print_exc(file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        results[name] = rows
    return timings, results, errors


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from spark_ifs_spark.session import get_spark

    spark = get_spark("spark_ifs_bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from spark_ifs_spark.operators.select_columns import select_columns
    from spark_ifs_spark.registry import QUERIES
    from spark_ifs_spark.sources.generator import random_conventional_df

    timings, results, errors = run_queries(spark, sf_dir, QUERIES, BENCH_QUERIES)

    # B4: cross-encoding identity on the embeddings selection (CL:167-169)
    try:
        conv = [(r["rank"], r["feature"]) for r in results["mrmr_select_k5"]]
        alt = [(r["rank"], r["feature"]) for r in results["row_select_k5"]]
        assert conv == alt, f"encoding mismatch: {conv} vs {alt}"
    except Exception as exc:
        errors["cross_encoding_identity"] = (
            f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
        )
        traceback.print_exc(file=sys.stderr)

    # B5: synthetic 10k x 50 categorical matrix, full greedy k=10.
    # fixture generation is staged (and materialized) OUTSIDE the timed
    # region — the entry measures the selector, not the RNG fixture
    try:
        wide, names = random_conventional_df(spark, rows=10_000, cols=51, seed=42)
        wide = wide.localCheckpoint(eager=True)
        b5 = []
        for _ in range(2):
            t0 = time.perf_counter()
            sel = select_columns(wide, "label", names, num=10)
            assert len(sel) == 10
            b5.append(time.perf_counter() - t0)
        timings["mrmr_k10_synthetic_10kx50"] = round(min(b5), 3)
    except Exception as exc:
        errors["mrmr_k10_synthetic_10kx50"] = (
            f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
        )
        traceback.print_exc(file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # One-time session-staging builds (minhash pairs/clusters, kNN edges,
    # bigram LL, ...) are paid on the first consumer's rep 1, which the
    # min-of-2 protocol discards — charge them explicitly so the reported
    # vector accounts for every second of computed work (r13 verdict,
    # "What's wrong" #1). Accounting only: the timed region, the timing
    # protocol, and every existing queries-entry are unchanged.
    from spark_ifs_spark.registry._common import STAGED_BUILD_SECS

    staged_builds = {k: round(v, 3) for k, v in sorted(STAGED_BUILD_SECS.items())}
    staged_total = round(sum(staged_builds.values()), 3)
    report = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "staged_builds": staged_builds,
        "staged_builds_sec": staged_total,
        "config": {
            "pyspark": spark.version,
            "master": f"local[{cpus}]",
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        },
    }
    if errors:
        report["errors"] = errors
    print(json.dumps(report))
    # The driver keeps only the LAST ~2000 chars of bench output, so a
    # single big JSON line loses its head (metric/value/total) to
    # truncation — BENCH_r02..r06 have no recoverable total. Emit a
    # SECOND compact summary line LAST (always < 2000 chars, so it
    # always survives the tail), and persist the full per-query report
    # to bench_full.json so the complete timing history lives in git.
    # Compact per-query signal for the driver (r13 verdict, "What's
    # wrong" #2): the full report line above is ~6 KB and loses its head
    # to the driver's 2000-char tail, so ALSO print the top-40 slowest
    # entries as their own short line (~1.3 KB) ahead of the final
    # summary — additions only, both existing lines are unchanged.
    top40 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:40])
    print(
        json.dumps(
            {
                "metric": "top_slowest_sec",
                "top": top40,
                "staged_builds_sec": staged_total,
                "sf": sf,
            }
        )
    )
    summary = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "n": len(timings),
        "n_errors": len(errors),
        "staged_builds_sec": staged_total,
        "sf": sf,
        "config": report["config"],
    }
    if errors:
        summary["error_names"] = sorted(errors)[:20]
    print(json.dumps(summary))
    # The committed bench_full.json is the CANONICAL per-round vector —
    # the next round's ratio denominator. Driver verify reruns used to
    # clobber it in the working tree (flagged by the r11 and r12
    # verdicts), so by default the full report now goes to the
    # untracked bench_out.json; only an explicit
    # SPARK_GRAFT_BENCH_CANONICAL=1 run (the builder producing the
    # round-end canonical commit) writes bench_full.json.
    out_name = (
        "bench_full.json"
        if os.environ.get("SPARK_GRAFT_BENCH_CANONICAL") == "1"
        else "bench_out.json"
    )
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w") as f:
            json.dump(report, f, indent=1)
    except OSError:
        pass  # read-only checkout must not fail the bench
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
