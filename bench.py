#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's registered queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the ``noop`` sink — full plan execution,
no driver-side collection, no disk write — so the number measures the
engine, not the harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the streaming-parity flagship, the relational spine, and
# every north-star extension family.  (Cheap projection-only parity
# queries are correctness-gated but not timed — they measure the scan,
# not the engine.)
HEADLINE = [
    "flagship_window_traffic",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_nation_revenue",
    "join_outer_counts",
    "q18_large_volume_orders",
    "q16_supplier_count_excluding",
    "salted_join_skew",
    "window_order_ranks",
    "window_frames_running",
    "topk_orders_per_customer",
    "range_join_ship_lag",
    "asof_purchase_last_click",
    "sessionize_users",
    "setops_users",
    "pivot_event_counts",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "resample_gapfill_daily",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_lsh",
    "dedup_clusters_embedding",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_vectorized",
    "text_quality",
    "text_fingerprint",
    "text_bpe_tokens",
    "text_tfidf_top_terms",
    "text_chunking",
    "pack_context_windows",
    "dataset_split_train_test",
    "corpus_clean_pipeline",
    "multimodal_payload_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    # round-2 additions: scale-path twins and pipeline stages
    "rfm_customer_segments",
    "fuzzy_match_blocked",
    "quality_repetition_signals",
    "pii_redact_blocklist",
    "stratified_sample_by_lang",
    "ngram_contamination_check",
    "embedding_int8_quantization",
    "time_range_typed_scan",
    # round-2 batch 2: frequency mining, cluster canonicalization,
    # dimension history, sharding, mixture sampling
    "heavy_hitters_twopass",
    "dedup_cluster_canonical",
    "scd2_customer_orders",
    "corpus_shard_assignment",
    "curriculum_mixture_sample",
    "incremental_agg_maintenance",
    "kmeans_embedding_clusters",
    "pagerank_nation_trade",
    # round-3 batch 4: forward as-of, retrieval scoring, novelty, vocab
    "asof_click_next_purchase",
    "bm25_topk",
    "ngram_novelty_decay",
    "vocab_oov_rate",
    "emb_hard_negatives",
    "embedding_label_margin",
    "length_bucketed_batches",
    "mixture_epoch_plan",
    "quality_calibrate_by_source",
    "mixture_materialize",
    # round-2 batch 3: boilerplate pruning, weighted sampling, z-order
    "boilerplate_shingle_prune",
    "weighted_sample_ares",
    "zorder_layout_audit",
    "quality_logreg_score",
    "phrase_search_positional",
    "table_profile",
    "dedup_containment",
    "dedup_containment_banded",
    "repeated_span_coverage",
    "source_cap_sample",
    "time_decay_user_scores",
    "user_daily_streaks",
    "unigram_perplexity_score",
    # round-4 additions: decayed counters, graph triangles, entropy
    # quality, hybrid-retrieval fusion, Kneser-Ney LM
    "decayed_hourly_traffic",
    "triangle_count_copurchase",
    "token_entropy_quality",
    "rrf_fusion_topk",
    "kneser_ney_bigram_lm",
    # round-4 batch 2: path mining, community detection, skyline,
    # entity resolution
    "event_path_trigrams",
    "lpa_community_labels",
    "skyline_pareto_orders",
    "association_rules_pairs",
    "winsorize_order_stats",
    "recursive_cte_hierarchy",
    "sketch_mergeability_audit",
    "theta_overlap_audit",
    "sensor_outage_islands",
    "weekly_growth_rates",
    "key_skew_audit",
    # round-5 additions: CV split, split leakage, PSI drift, detector
    # agreement, lossless excerpt containment (dedup_containment_banded
    # above)
    "stratified_kfold_split",
    "split_leakage_audit",
    "column_drift_audit",
    "near_dup_agreement_audit",
    "lateral_topn_per_nation",
    "approx_top_k_users",
    "benford_digit_audit",
    "revenue_concentration_gini",
    "dsir_importance_weights",
    "packing_efficiency_audit",
    "embedding_anisotropy_audit",
    "token_fertility_by_lang",
    "cross_source_duplication_matrix",
    "vocab_coverage_curve",
    "embedding_contamination_check",
    "trend_seasonal_decompose",
    "multitouch_attribution",
    "referential_integrity_audit",
    "lang_id_confusion",
    "quality_precision_at_k",
    "quality_auc_en",
    "chi2_lang_source_independence",
    "quality_gains_by_band",
    "jackknife_ci_order_total",
    "acf_hourly_traffic",
    "ks_drift_orders",
    "cusum_changepoint_daily",
    "robust_outliers_mad",
    "link_prediction_scores",
    "zipf_law_fit",
    "heaps_law_fit",
    # round-5 closing additions: runtime-filter pruning, CF similarity,
    # bounded BFS
    "bloom_runtime_filter_audit",
    "copurchase_item_similarity",
    "bfs_hops_from_hub",
    "semdedup_semantic_prune",
    "mmr_diversified_topk",
    "k_anonymity_audit",
    "erasure_cascade_audit",
    "quantile_normalize_by_source",
    "ppr_nation_trade_seeds",
    # round-5 batch 3: sketch point-queries, graded ranking eval,
    # native session windows, Spark-4 SQL/Python surface
    "countmin_error_audit",
    "ndcg_quality_ranking",
    "session_window_native",
    "sql_pipe_surface",
    "udtf_chunk_spans",
    "window_distribution_stats",
    "map_hof_surface",
    "ann_recall_audit",
    "holt_linear_daily",
    "kcore_peel_copurchase",
    "mrr_quality_by_source",
    "hits_hubs_authorities",
    "kaplan_meier_retention",
    "order_concurrency_peaks",
    "mutual_information_lang_source",
    "markov_stationary_events",
    "association_rules_triples",
    "sssp_weighted_copurchase",
    "grid_density_clusters",
    "textrank_keywords",
    "burst_detection_daily",
    "winnowing_dup_pairs",
    # round-5 classic-analytics batch
    "welch_t_test_orders",
    "theil_sen_trend_daily",
    "forecast_backtest_mase",
    "degree_assortativity_copurchase",
    "local_clustering_topk",
    "event_regex_funnel",
    # round-5 closing batches: inference, linear algebra, calibration,
    # explainability, policy evaluation, sampling design
    "naive_bayes_lang_eval",
    "jl_projection_distortion_audit",
    "rle_compression_audit",
    "anova_f_priority_spend",
    "spearman_daily_kpis",
    "lang_id_agreement_ari",
    "shard_shuffle_quality",
    "pca_top_component",
    "doc_stitch_overlap",
    "bloom_filter_sizing",
    "kruskal_wallis_priority_spend",
    "compaction_coalesce_plan",
    "seasonal_strength_audit",
    "pav_calibration_bins",
    "conformal_coverage_audit",
    "decision_stump_split",
    "curation_decision_log",
    "equidepth_histogram_stats",
    "blocking_cost_audit",
    "bandit_replay_evaluation",
    "feature_hashing_collision_audit",
    "neyman_allocation_plan",
    "fdr_bh_screen",
    "poisson_bootstrap_se",
    "cuped_adjusted_ab",
    "modularity_brand_copurchase",
    "selectivity_estimate_audit",
    "nearest_centroid_accuracy",
    "dictionary_encoding_audit",
    # round-8 additions: LSH banding twins, exact-substring islands
    "dedup_embedding_lsh_recall",
    "lsh_banding_tradeoff_audit",
    "repeated_span_islands",
    # round-8 batch B: mixture smoothing, greedy max-coverage selection
    "temperature_sampling_plan",
    "greedy_source_coverage",
    # round-9 additions: the exact-substring CUT deliverable + savings,
    # the IVF probe design table, incremental span maintenance (all
    # measured 2.1-3.0 s at sf0.1 on the round-9 host — over the 0.3 s
    # HEADLINE line)
    "exact_substring_cut",
    "exact_substring_cut_savings",
    "ivf_probe_recall_audit",
    "incremental_span_coverage",
    # round-10 additions: trained-IVF quantizer arc, streaming span twin
    "ivf_kmeans_recall_audit",
    "sim_topk_ivf_kmeans",
    "ivf_quantizer_balance_audit",
    "incremental_span_coverage_stream",
    # round-10 membership audit (round-9 VERDICT): previously-untimed
    # non-trivial shapes whose plan machinery (expand, unrolled merge
    # iteration, theta-join baseline, decorrelation) the timed set did
    # not isolate
    "cube_status_priority",
    "grouping_sets_orders",
    "bpe_merge_induction",
    "fuzzy_match_levenshtein",
    "correlated_subquery_orders",
    # round-10 extended-session additions: dedup-state stream twin and
    # the quantizer-lifecycle audits
    "incremental_exact_dedup_stream",
    "ivf_quantizer_stability_audit",
    "ivf_seeding_recall_audit",
]
# lsh_parameter_planner is correctness-gated but not timed: it is a
# constant 32-row frame with no table scan — timing it measures nothing.
# dedup_embedding_cosine (the exact all-pairs baseline) is correctness-
# gated but not timed: it is O(n²) by construction — the timed scale
# path over the same threshold is dedup_embedding_lsh.
# dedup_clusters_minhash is correctness-gated but not timed: it is the
# same connected-components loop as the two timed CC queries, fed by
# the already-timed minhash pair generator.
# entity_fuzzy_clusters is correctness-gated but not timed for the same
# reason: the timed fuzzy_match_blocked pair generator feeding the same
# (twice-timed) connected-components loop.
# survivorship_golden_record is correctness-gated but not timed likewise:
# its cost IS entity_fuzzy_clusters (pair generator + CC loop) plus one
# grouped aggregate and one per-cluster window over |members| rows.


# Instance calibration: a fixed pure-CPU query (whole-stage-codegen
# arithmetic over spark.range, no shuffle, no I/O, no data dependence)
# timed min-of-3 before the suite.  Its runtime depends only on machine
# speed, so cross-round suite ratios divide by `instance_factor` =
# calib_sec / CALIB_REFERENCE_SEC instead of eyeballing an untouched
# query.  The reference constant is the min-of-3 measured on the round-5
# bench host; a factor of 1.3 means "this VM ran the fixed query 1.3x
# slower than that host did".
CALIB_REFERENCE_SEC = 0.722

# Second calibration axis (round 6): the pure-CPU query above misses
# memory-bandwidth/shuffle steal — round 6 measured cpu factor 1.02 on
# a host whose untouched scan-agg control (q1_pricing_summary isolated
# min-of-3) ran 1.8x slower than round 5's, with the untouched-query
# suite median at 1.35x.  This fixed shuffle-heavy aggregate (100M rows
# into 10M groups: hash-table build + exchange, no I/O, no data
# dependence) is memory-bound, so `mem_instance_factor` captures that
# axis.  Reference constant = min measured on the round-6 bench host
# (steady state after JIT warm-up; the suite's q1 warm pass runs first).
MEM_CALIB_REFERENCE_SEC = 5.54


def _calibrate(spark) -> float:
    best = None
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "sum(sin(id * 1e-7) + cos(id * 1e-7)) as s"
        ).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _calibrate_mem(spark) -> float:
    best = None
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "id % 10000000 as k"
        ).groupBy("k").count().write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from scats_transis_kinesis_spark.plans.registry import REGISTRY
    from scats_transis_kinesis_spark.session import get_session

    spark = get_session(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # Warm the JVM + parquet footers once so per-query times measure
    # execution, not first-touch classloading.
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    calib_sec = _calibrate(spark)
    mem_calib_sec = _calibrate_mem(spark)

    # Each query is timed over PASSES runs and reports the MINIMUM —
    # this host shows bursty multi-tenant CPU steal (measured: the same
    # query varies 2.3 s ↔ 21 s across suite runs with no code change),
    # and the min is the standard spike-robust estimator for
    # deterministic single-machine workloads (it converges on the
    # noise-free cost; mean/median keep the steal).  Methodology is
    # pinned in BASELINE.md.
    PASSES = 2
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(PASSES):
            t0 = time.time()
            REGISTRY[name].fn(spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # Iterative operators cache intermediates for their own run;
            # drop them so the next measurement doesn't pay leftover
            # executor-memory pressure.
            spark.catalog.clearCache()
        times[name] = round(best, 3)

    sf_label = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label
    # Per-query timings go to a side file: the driver captures only the
    # tail of stdout, and a 67-query inline map overflowed its window in
    # round 2 ("parsed": null).  The final line stays compact and is the
    # ONE machine-readable JSON line of the run.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {"sf": sf, "unit": "sec", "queries": times}, fh, indent=1, sort_keys=True
        )
        fh.write("\n")
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:8])
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "n_queries": len(times),
                "sf": sf,
                "calibration_sec": round(calib_sec, 3),
                "instance_factor": round(calib_sec / CALIB_REFERENCE_SEC, 3),
                "mem_calibration_sec": round(mem_calib_sec, 3),
                "mem_instance_factor": round(
                    mem_calib_sec / MEM_CALIB_REFERENCE_SEC, 3
                ),
                "queries": slowest,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
