"""Scale-assurance run: replicate the sf0.1 corpus N× and run the
headline pipeline queries against it, recording wall-times and shuffle
volumes (from the local Spark UI REST API). Results go to stdout as a
markdown table for SCALE.md.

Usage: python tools/scale_run.py [factor ...]   (default: 10 100)

Replicas get distinct doc_ids and every WORD is tagged with the replica
id, so replicas are mutually dissimilar (cross-replica Jaccard ≈ 0,
like genuinely fresh corpus shards) while the near-dup structure WITHIN
each replica is preserved — output sizes scale linearly with the
factor, as a real corpus's would, and the engine work is the variable
under test.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_ifs_scale"


def gen(spark: SparkSession, factor: int) -> str:
    out = f"{OUT}/x{factor}"
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    # stopwords stay untagged so quality scoring keeps
                    # working; content words carry the replica tag, so
                    # cross-replica Jaccard stays ~0 (nearly every
                    # 3-shingle contains a content word)
                    lambda w: F.when(
                        w.isin("the", "a", "of", "and", "is", "to", "in"), w
                    ).otherwise(
                        F.concat(w, F.lit("_"), F.col("rep").cast("string"))
                    ),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            F.col("n_chars").alias("n_chars"),
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_emb = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.001),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    # orders: custkey shifted per replica so the 2-D (custkey, date)
    # domain grows linearly in x — the zorder_layout audit sees N× the
    # files over an N×-wider key range, like a real multi-tenant lake
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    n_cust = orders.agg(F.max("o_custkey")).first()[0] + 1
    (
        orders.crossJoin(reps)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * n_cust)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    # events: user_id (and event_id) shifted per replica — the user
    # POPULATION grows N× inside the same 30-day span, like real
    # product growth: per-user event counts, session shapes and
    # conversation lengths stay fixed while row counts scale linearly,
    # so user-keyed operators (sft_pack, sessionization, CUPED) face
    # N× more groups of unchanged size — the shape they must scale on
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * n_usr).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    return out


def shuffle_totals(spark: SparkSession) -> tuple[float, float]:
    """(total shuffle write MB, max single-stage shuffle write MB) over
    all completed stages of the app so far."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return sum(writes) / 1e6, max(writes or [0]) / 1e6


def main() -> None:
    args = sys.argv[1:]
    only: list[str] | None = None
    if "--only" in args:
        k = args.index("--only")
        only = args[k + 1 :]
        args = args[:k]
    factors = [int(a) for a in args] or [10, 100]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("spark_ifs_scale_run")
        .getOrCreate()
    )
    from spark_ifs_spark.registry import QUERIES

    names = [
        "corpus_clean",
        "dedup_minhash",
        "dup_clusters",
        "pipeline_end_to_end",
        "dedup_embedding_lsh",
        "dedup_embedding_lsh_hi",
        "semantic_dedup",
        "hard_negatives",
        "ann_topk_ivfpq",
        "cluster_aware_split",
        "negative_samples",
        "dedup_substring_runs",
        "dedup_jaccard_prefix",
        "word_triangles",
        "mrmr_select_k5",
        "jmi_select_k5",
        "row_select_k5",
        "dsir_select",
        "dedup_containment",
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
        # round 7
        "url_dedup",
        "doremi_weights",
        "doremi_mix",
        "unigram_lm_vocab",
        "unigram_token_counts",
        "tokenizer_fertility",
        "unigram_doc_tokens",
        "pref_bt_ratings",
        "split_psi",
        "bootstrap_doclen_ci",
        "lm_kn_logprob",
        "dedup_substring_removal",
        # round 8 (pref_pl_ratings is deliberately absent: its corpus
        # pass is the pref_bt_ratings shape with one extra stride join,
        # and the replicated corpus's doc count is ≡ 0 mod the source
        # cardinality, which degenerates the three-way match fixture)
        "c4_line_filters",
        "c4_line_dedup",
        "kmeans_train",
        "tokenizer_compare",
        "dedup_source_matrix",
        "winnow_fingerprints",
        "shard_dup_coverage",
        "winnow_pairs",
        "readability_scores",
        "kmv_distinct_sources",
        "priority_sample",
        "source_centroid_sim",
        "heaps_law_fit",
        "quality_threshold_sweep",
        "dedup_retention",
        "packing_waste_curve",
        "ngram_coverage_curve",
        "dedup_cluster_purity",
        "quality_calibration",
        "label_agreement_kappa",
        "zorder_layout",
        # round 9 (knn_graph_recall is deliberately absent: its truth
        # side is brute-force sample×corpus BY DESIGN — the audit tool,
        # not the operator; its cost is priced by sample_mod, and the
        # graph under audit is the knn_graph row)
        "knn_graph",
        "packing_assignment",
        "coverage_select_k5",
        # round 10
        "graph_diversity_select_k5",
        "knn_label_prop",
        "epoch_shuffle_manifest",
        "facility_select_k5",
        "curriculum_manifest",
        "knn_centrality",
        # join_skew_plan and ab_cuped are plain two-level aggregates
        # with no scale question to measure
        # round 11: the registry now stages ONE kNN-graph build per
        # (corpus, session) — the family rows above measure build-once
        # + consumer fan-out; the serving walk and its audit ride the
        # same staged graph
        "ann_topk_graph",
        "ann_graph_recall_audit",
        "dedup_phash",
        "cms_heavy_hitters",
        "quantile_sample_audit",
        "multimodal_frame_sample",
        # round 12: the events replicator (user population grows N×,
        # per-conversation shape fixed) gives the events-table packers
        # measured rows
        "sft_pack",
        "rank_sketch_quantiles",
        "mg_heavy_hitters",
        "heavy_hitter_cross_audit",
        "cross_modal_dedup",
        "kmv_source_overlap",
        "source_length_quantiles_sketch",
        # round 13: audio modality joins the dedup family
        "dedup_audio_fp",
        "audio_fp_recall_audit",
        "quantile_cross_audit",
        "distinct_cross_audit",
        "overlap_cross_audit",
    ]
    # queries whose output is a unique-keyed join or an aggregate whose
    # value columns a bare count() would let Catalyst PRUNE — force the
    # full output with a hash-fold aggregate (the r7 lesson: the
    # eliminated join measured 0.9 s with zero shuffle)
    full_output = {
        "c4_line_filters",
        "c4_line_dedup",
        "kmeans_train",
        "tokenizer_compare",
        "dedup_source_matrix",
        "winnow_fingerprints",
        "shard_dup_coverage",
        "winnow_pairs",
        "readability_scores",
        "kmv_distinct_sources",
        "priority_sample",
        "source_centroid_sim",
        "heaps_law_fit",
        "quality_threshold_sweep",
        "dedup_retention",
        "packing_waste_curve",
        "ngram_coverage_curve",
        "dedup_cluster_purity",
        "quality_calibration",
        "label_agreement_kappa",
        "zorder_layout",
        "knn_graph",
        "packing_assignment",
        "coverage_select_k5",
        "graph_diversity_select_k5",
        "knn_label_prop",
        "epoch_shuffle_manifest",
        "facility_select_k5",
        "curriculum_manifest",
        "knn_centrality",
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
    }
    if only:
        names = [n for n in names if n in only]
    print("| factor | rows(docs) | query | wall s | rows out | Δshuffle MB |")
    print("|---|---|---|---|---|---|")
    for factor in factors:
        sf_dir = gen(spark, factor)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in names:
            before, _ = shuffle_totals(spark)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            if name in full_output:
                n_out = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    # pmod keeps the forced-output fold inside int64
                    # under ANSI mode (a raw xxhash64 sum overflows)
                    F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
                ).first()["n"]
            else:
                n_out = df.count()
            dt = time.time() - t0
            after, _ = shuffle_totals(spark)
            print(
                f"| {factor}x | {n_docs} | {name} | {dt:.1f} | {n_out} |"
                f" {after - before:.1f} |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
