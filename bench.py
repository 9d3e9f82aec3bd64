"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Execution is forced with the noop sink (full computation, no driver
collect, no disk write) — measuring plan execution, not materialization
overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_revenue",
    "multiway_join_cte",
    "first_wins_dedup",
    "string_agg_group",
    "flatmap_attempts",
    "surrogate_returning",
    "update_from_coalesce",
    "events_windowed",
    "events_sessionize",
    "dedup_exact",
    "minhash_near_dup",
    "simhash",
    "similarity_topk",
    "ivf_assign",
    "text_quality",
    "multimodal_decode",
    "ngram_jaccard_pairs",
    "vector_lsh_near_dup",
    "ivf_search",
    "asof_join",
    "hopping_window",
    "skew_salted_agg",
    "topk_per_group",
    "high_cardinality_agg",
    "corpus_clean",
    # grouped_zscore_pandas deliberately excluded: it exists to measure
    # the applyInPandas escape hatch (~20s at sf0.1 vs ~0.6s native for
    # the same math — see PERF.md); headline numbers track the engine's
    # intended JVM-expression paths.
]

# Round-1's headline set, unchanged, so r{N}-vs-r1 per-query deltas stay
# computable; `warm_total_r1_set` reports this subset's sum next to the
# full total.
R1_SET = list(HEADLINE)

HEADLINE += [
    # added in round 2
    "min_cost_supplier",
    "top_supplier_q15",
    "entity_clusters",
    "pq_search_rerank",
    # added late round 2
    "entity_components",
    "entity_golden_records",
    "dataset_split",
    "source_quota_sample",
    "sequence_packing",
    "nation_volume_q7",
    "mixture_weighted_sample",
]

# Round-2's full headline set (r1 set + the round-2 additions), frozen so
# round-3+ benches report per-query deltas against BENCH_r02 — any query
# >1.3x slower than its r2 warm time is a regression to chase.
R2_SET = list(HEADLINE)

HEADLINE += [
    # added in round 3: corpus-dedup compositions (catalog_r3b) + the
    # headline round-3 extras (TPC-H completion is covered by the Q-shape
    # queries already in the set; these are the new operator families)
    "near_dup_keep",
    "corpus_curate",
    "incremental_dedup",
    "boilerplate_shingle_fraction",
    "gopher_quality_signals",
    "sq8_search_rerank",
    "ivfpq_search",
    "decontaminate_ngrams",
    "pii_redaction",
]

# Round-3's full headline set, frozen for round-4+ per-query deltas
# (same device as R1_SET/R2_SET).
R3_SET = list(HEADLINE)

HEADLINE += [
    # late round-3: full FAISS-semantics residual IVFPQ; the raw-crawl ->
    # training-shards end-to-end; ES weighted sampling
    "ivfpq_residual_search",
    "corpus_to_shards",
    "weighted_sample_docs",
    "chunk_documents",
    "funnel_progression",
    # session C: passage-granular exact dedup + inverted-index BM25 +
    # the analytics tier (cohorts, Markov transitions, c-TF-IDF,
    # integer PageRank)
    "passage_dedup",
    "bm25_search",
    "cohort_retention",
    "event_transitions",
    "source_top_terms",
    "pagerank_parts",
    "data_quality_report",
    "forward_fill_events",
    "temperature_mixture_sample",
    "robust_outliers",
    "token_cooccurrence",
    "snapshot_diff",
    "triangle_count",
    "dataset_split_grouped",
    "dedup_eval",
    "skew_salted_join",
    "wow_growth",
    "ship_latency_histogram",
    "impute_group_mean",
    "ab_test_ztest",
    "rfm_segments",
    "pareto_frontier",
    "event_paths",
    "dim_date",
    "cohort_ltv",
    "feature_hashing",
    "quantile_normalize",
    "winsorized_mean",
    "event_debounce",
    "region_share",
    "conversion_hazard",
    "skew_report",
    "resample_interpolate",
    "bfs_hops",
    "basket_rules",
]

# Round-4's full headline set, frozen for round-5+ per-query deltas.
R4_BASE_SET = list(HEADLINE)

HEADLINE += [
    # round 4: data-layout tier + regression/sketch/CV + nearest as-of +
    # JSONL/ORC round-trips + semantic dedup + the leakage audit
    "grouped_linreg",
    "rolling_distinct_customers",
    "hll_distinct_audit",
    "kfold_assignment",
    "bucketed_join",
    "partitioned_scan_prune",
    "zorder_layout",
    "asof_join_nearest",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "semantic_dedup",
    "split_leakage_report",
    "cascade_delete_report",
]

# Round-4's FULL headline set (99 queries), frozen for round-5+ deltas.
R4_SET = list(HEADLINE)

HEADLINE += [
    # late round-4 (added to the headline in round 5, when rotation
    # promoted them to driver slots): analytics/layout/graph extras
    "argmax_per_group",
    "time_weighted_avg",
    "weighted_median",
    "bucket_checksum_diff",
    "quantile_sketch_audit",
    "chi_square_independence",
    "benford_digit_audit",
    "quality_lr_score",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "random_walks",
    "neyman_allocation",
    "bom_rollup",
    "yoy_growth",
    "cumulative_distinct_customers",
    "fixed_width_roundtrip",
    "variant_json_stats",
    "correlation_matrix",
    "scd2_asof_view",
    "trending_parts",
    "scd2_temporal_join",
    "label_propagation_communities",
    "corpus_diversity_report",
    "dup_rate_by_source",
    "order_to_ship_funnel_daily",
    "ewma_daily_revenue",
    "hourly_seasonality",
]

# Round-5's BASE headline set (126 queries: R4_SET + the late-r4
# additions above), frozen for round-6+ per-query deltas; round-5's own
# additions append below and freeze as R5_SET at round close.
R5_BASE_SET = list(HEADLINE)

HEADLINE += [
    # round-5 additions (round close): CDC/incremental tier
    "cdc_apply",
    "incremental_agg_merge",
    "gaps_islands",
    "rolling_correlation",
    "order_gap_features",
    # ML-experiment / feature engineering
    "loo_target_encoding",
    "cuped_adjustment",
    "temporal_purged_split",
    "negative_sampling",
    "ipw_treatment_effect",
    # probabilistic structures
    "bloom_prune_audit",
    "cms_frequency_audit",
    "sketch_reaggregation_audit",
    "score_calibration",
    # text / corpus analysis
    "vocab_coverage",
    "readability_scores",
    "token_shift_lor",
    "source_vocab_overlap",
    "prefix_filter_jaccard_join",
    # profiling / drift / monitoring
    "column_entropy_profile",
    "mutual_information",
    "distribution_drift_audit",
    "late_data_audit",
    "rolling_anomaly_flags",
    "max_drawdown",
    "theil_sen_trend",
    "anova_oneway",
    "last_touch_attribution",
    # graph
    "kcore_decomposition",
    "link_prediction_scores",
    "clustering_coefficient",
    # embeddings
    "embedding_drift_by_label",
    "embedding_dim_health",
    # concentration metrics
    "revenue_concentration",
]

# Round-5 headline set (160 queries; includes every registered driver
# slot), frozen for round-6+ per-query deltas.
R5_SET = list(HEADLINE)

# Post-freeze round-5 additions (kept out of R5_SET so its cross-round
# deltas stay comparable; they still run and report per-query times).
HEADLINE += [
    # tokenizer tier
    "bpe_tokenize",
    "bpe_merge_audit",
    # order-to-cash / survival tier
    "fifo_allocation",
    "revenue_recognition",
    "kaplan_meier",
    # layout / statistics audits tier (catalog_r5c)
    "geo_grid_join",
    "rendezvous_sharding",
    "zonemap_skip_audit",
    "join_cardinality_estimate",
    "cusum_changepoints",
    "encoding_advisor",
    # data-contract / experimentation tier (catalog_r5d)
    "fd_violation_audit",
    "bootstrap_ci_revenue",
    "qini_uplift",
    "top_p_vocab",
    # privacy / interval tier (catalog_r5e)
    "k_anonymity_audit",
    "max_concurrent_orders",
    # weighted-graph / inference / calendar tier (catalog_r5f)
    "weighted_sssp",
    "fdr_bh_audit",
    "conformal_interval_audit",
    "business_day_latency",
    "littles_law_audit",
    "dp_noisy_counts",
    # embedding-truncation / recommender / causal tier (catalog_r5g)
    "matryoshka_recall_audit",
    "item_item_cf_topk",
    "did_estimate",
    # recursion / retrieval tier (catalog_r5h)
    "recursive_bom_rollup",
    "rrf_hybrid_search",
    # retrieval-quality / monitoring / stats tier (catalog_r5i)
    "ann_ndcg_audit",
    "psi_drift_audit",
    "equidepth_histogram",
    # SNM blocking / forecast-skill tier (catalog_r5j)
    "sorted_neighborhood_pairs",
    "mase_forecast_audit",
    # temporal rules / privacy triad / forecast decomposition (catalog_r5k)
    "sequential_purchase_rules",
    "t_closeness_audit",
    "brier_decomposition",
    # Spark-4 source surfaces (catalog_r5l)
    "xml_roundtrip",
    "python_datasource_scan",
    # Spark-4 SQL surfaces (catalog_r5m)
    "pipe_syntax_pricing",
    "sql_udf_taxed_margin",
    # survival hazard / sequential monitoring / blocking eval (catalog_r5n)
    "nelson_aalen_hazard",
    "interim_analysis_audit",
    "blocking_recall_audit",
    # off-policy evaluation (catalog_r5o)
    "bandit_replay_eval",
    # cooperative-game attribution / observational estimators (catalog_r5p)
    "shapley_attribution",
    "rdd_estimate",
    "poststratification_estimate",
]

# Round-6 widening (VERDICT r5 item 3): the remaining catalog queries
# that were never in the headline list — mostly early-round shapes whose
# operator coverage is subsumed by a later headline query, plus the two
# r5q stats tests — so BENCH_r06+ carries a per-query time for EVERY
# registered query (280/280).  Alphabetical; appended after the R5 sets
# so every earlier frozen set keeps its cross-round comparability.
HEADLINE += [
    "anti_join",
    "blamed_suppliers_q21",
    "brand_bracket_revenue_q19",
    "case_tristate",
    "click_attribution",
    "compose_body",
    "cube_revenue",
    "date_parse_null_on_error",
    "distinct_count",
    "doc_fingerprint",
    "entity_components_star",
    "entity_survivors",
    "exact_quantiles",
    "excess_share_suppliers_q20",
    "exists_correlated",
    "extend_provenance",
    "filter_compound",
    "flatmap_attempts_udtf",
    "forecast_revenue_q6",
    "fuzzy_name_pairs",
    "fuzzy_pairs_blocked",
    "grouped_zscore_pandas",
    "grouping_sets_revenue",
    "important_parts_q11",
    "intersect_except",
    "ivf_kmeans_search",
    "json_extract_construct",
    "json_payload_extract",
    "kmeans_clusters",
    "kruskal_wallis",
    "lang_id",
    "lang_profile_score",
    "large_volume_customers_q18",
    "late_lines_priority_q12",
    "local_supplier_volume_q5",
    "market_share_q8",
    "max_order_per_customer",
    "min_cost_supplier_agg",
    "minhash_signatures",
    "mixture_config_sample",
    "near_dup_clusters",
    "notin_distinct_suppliers",
    "ntile_percentiles",
    "order_count_distribution",
    "pack_bins_balanced",
    "pack_bins_bestfit",
    "pack_utilization",
    "pivot_events",
    "pq_kmeans_search_rerank",
    "pq_search",
    "product_profit_q9",
    "promo_revenue_q14",
    "qa_left_joins",
    "range_join_pairs",
    "regex_extract_tokens",
    "rename_project",
    "returned_items_q10",
    "rolling_30d_spend",
    "rollup_revenue",
    "running_totals",
    "scd2_merge",
    "semi_join",
    "session_window_native",
    "small_quantity_revenue",
    "source_mix_report",
    "spearman_rho",
    "sq8_search",
    "stratified_exact_sample",
    "token_length_histogram",
    "union_by_name",
    "unpivot_metrics",
    "waiting_customers_q22",
    "window_rank_lag",
]

# Round-6's FULL headline set (280 queries — the whole catalog at the
# round-6 open), frozen for round-7+ per-query deltas.
R6_SET = list(HEADLINE)

# Post-freeze round-6 additions (kept out of R6_SET so its cross-round
# deltas stay comparable; they still run and report per-query times).
HEADLINE += [
    # streaming-twin completion + rank/causal evaluation (catalog_r6)
    "click_attribution_outer",
    "auc_mann_whitney",
    "l_diversity_audit",
    "iv_wald_estimate",
    "permutation_test_revenue",
    # forecasting / reweighting / chunk planning (catalog_r6b)
    "holt_linear_forecast",
    "ipf_raking_weights",
    "audio_chunk_plan",
    # linkage / selection / mining (catalog_r6c)
    "fellegi_sunter_em",
    "dsir_importance_sample",
    "hard_negative_mining",
    # LSH tuning / decayed ranking / quantile eval (catalog_r6d)
    "minhash_band_advisor",
    "decayed_topk",
    "pinball_quantile_eval",
    # distribution / survival tests + LATERAL surface (catalog_r6e)
    "ks_two_sample",
    "logrank_test",
    "lateral_topn_per_group",
    # collation surface + autocorrelation (catalog_r6f)
    "collated_distinct_audit",
    "acf_daily_revenue",
    # incremental view maintenance (catalog_r6g)
    "join_view_delta_maintain",
    # LLM-evaluation estimators (catalog_r6h)
    "pass_at_k_estimate",
    "bradley_terry_rating",
    "preference_cycle_audit",
    # drift distance / tree splits / risk encoding (catalog_r6i)
    "emd_drift_audit",
    "best_split_finder",
    "woe_iv_encoding",
    # missing-mass estimators + trend breaks (catalog_r6j)
    "capture_recapture_estimate",
    "chao1_unseen_vocab",
    "chow_break_test",
    # experiment design (catalog_r6k)
    "ab_power_analysis",
]

# Round-7's FULL headline set (310 queries — the whole catalog at the
# round-7 open = R6_SET + the 30 post-freeze round-6 additions),
# frozen for round-8+ per-query deltas (VERDICT r6 item 3).
R7_SET = list(HEADLINE)

# Post-freeze round-7 additions (kept out of R7_SET so its cross-round
# deltas stay comparable; they still run and report per-query times).
HEADLINE += [
    # IVF-shape contrastive mining + its measured recall, and the
    # streaming HLL state's batch twin (catalog_r7)
    "hard_negative_mining_ivf",
    "hard_negative_recall_audit",
    "event_type_distinct_sketch",
    # forensics / corpus health / causal matching / calibration /
    # skyline / heavy hitters (catalog_r7b)
    "benford_second_digit_audit",
    "zipf_slope_audit",
    "simpson_paradox_audit",
    "isotonic_calibration",
    "propensity_caliper_match",
    "pareto_skyline",
    "heavy_hitters_audit",
    # nonparametric / categorical test battery (catalog_r7c)
    "mk_trend_test",
    "runs_test",
    "kendall_tau_cells",
    "mcnemar_test",
    "cramers_v",
    "grubbs_outlier",
    # experimentation plumbing (catalog_r7d)
    "cuped_variance_reduction",
    "srm_check",
    "winsorized_mean_revenue",
    # pairwise inference + supervised encoding (catalog_r7e)
    "welch_t_test",
    "cohens_kappa",
    # seasonal decomposition + remaining test batteries (catalog_r7g)
    "stl_decomposition_lite",
    "holm_bonferroni",
    "levene_test",
    "friedman_test",
    # corpus growth + word dispersion (catalog_r7h)
    "heaps_law_fit",
    "word_burstiness_audit",
    # theta-sketch set algebra (catalog_r7i)
    "theta_set_ops_audit",
    # Markov removal-effect attribution (catalog_r7j)
    "markov_removal_attribution",
]

# Round-8's FULL headline set (339 queries — the whole catalog at the
# round-8 open = R7_SET + the 29 post-freeze round-7 additions),
# frozen for round-9+ per-query deltas (VERDICT r7 item 1).
R8_SET = list(HEADLINE)

# Post-freeze round-8 additions (kept out of R8_SET so its cross-round
# deltas stay comparable; they still run and report per-query times).
HEADLINE += [
    # scale-posture closures (catalog_r8): capped caliper twin +
    # ratio-scaled hard-negative miner and its recall audit
    "propensity_caliper_match_capped",
    "hard_negative_mining_ivf_scaled",
    "hard_negative_scaled_recall_audit",
    # tier 2 (catalog_r8b): seasonal recursion + theta-sketch batch twin
    "holt_winters_seasonal",
    "event_type_theta_overlap",
    # tier 3 (catalog_r8c): post-hoc / location / trend / dispersion /
    # parametric-survival statistics
    "tukey_hsd",
    "mood_median_test",
    "cochran_armitage_trend",
    "negative_binomial_overdispersion",
    "weibull_survival_fit",
    # tier 4 (catalog_r8d): regression diagnostics, serial correlation,
    # ordered trend, semi-parametric survival
    "cox_ph_binary",
    "ljung_box_test",
    "durbin_watson_test",
    "breusch_pagan_test",
    "jonckheere_terpstra",
    # tier 5 (catalog_r8e): compressed-vector retrieval, JL sketching,
    # Bayesian A/B, randomized response
    "binary_quantize_search",
    "binary_rerank_recall_audit",
    "jl_projection_recall_audit",
    "bayes_ab_prob_superiority",
    "rappor_freq_estimate",
    # tier 6 (catalog_r8f): corpus LM scoring, rank changepoint,
    # intermittent demand, normality, ordered repeated measures
    "bigram_lm_perplexity",
    "pettitt_changepoint",
    "croston_intermittent",
    "jarque_bera_test",
    "page_trend_test",
    # tier 7 (catalog_r8g): link analysis, rank post-hocs, dispersion,
    # seasonal trend, influence, forecast skill
    "hits_hub_authority",
    "dunn_posthoc",
    "ansari_bradley",
    "seasonal_mk_trend",
    "cooks_distance_outliers",
    "theil_u2_forecast_audit",
    # tier 8 (catalog_r8h): post-slot extras, round-9 promotion pool
    "mmr_diversified_rerank",
    "fisher_exact_2x2",
    "hurst_exponent",
    "partial_correlation_triples",
    "bartlett_test",
    # tier 9 (catalog_r8i): stratified/panel categorical tests,
    # stationarity, PACF
    "cochran_q_test",
    "mantel_haenszel_cmh",
    "kpss_stationarity",
    "pacf_durbin_levinson",
    # tier 10 (catalog_r8j): literal-table spectral audit,
    # distribution-free median CI
    "seasonal_periodogram_audit",
    "median_ci_order_stat",
    # tier 11 (catalog_r8k + streaming/topk.py): Misra-Gries
    # mergeable-summary algebra, streaming twin in test_streaming
    "heavy_hitters_merge_audit",
    # tier 12 (catalog_r8l): proportion interval + sequential testing
    # + the homogeneity gate for the MH common OR
    "wilson_score_interval",
    "sprt_boundary_crossing",
    "breslow_day_homogeneity",
]

# Round-9 open's full headline set (R8_SET + the round-8 post-freeze
# additions above), frozen for round-10+ per-query deltas (VERDICT r8
# item 2 — the companion fix is that every close now writes the FULL
# per-query table to a tracked BENCH_LOCAL_r{N}.json and the frozen-set
# comparison runs median-of-3, so cross-round deltas are computable
# from tracked artifacts alone).
R9_SET = list(HEADLINE)

# Post-freeze round-9 additions (kept out of R9_SET so its cross-round
# deltas stay comparable; they still run and report per-query times).
HEADLINE += [
    # IVF-fed MMR's brute recall twin (the production MMR itself was
    # already benched as a round-8 tier-8 entry; round 9 re-pointed it
    # at the index — same name, new shortlist path)
    "mmr_shortlist_recall_audit",
    # tier 1 (catalog_r9a): nonparametric / paired tests
    "wilcoxon_signed_rank",
    "sign_test_paired",
    "cox_stuart_trend",
    "turning_points_test",
    "brunner_munzel",
    "cliffs_delta_effect",
    "hodges_lehmann_shift",
    "kruskal_gamma",
    "somers_d",
    # tier 2 (catalog_r9b): regression & time series
    "quantile_regression_irls",
    "granger_lag1_test",
    "arch_lm_test",
    "yule_walker_ar2",
    "diebold_mariano_test",
    "tracking_signal_audit",
    "permutation_entropy",
    "sen_slope_seasonal",
    "ewma_control_chart",
    # tier 3 (catalog_r9c): categorical & experimentation
    "g_test_independence",
    "bayesian_shrinkage_rates",
    "ratio_metric_delta_ci",
    "evalue_sensitivity",
    "overlap_weights_ato",
    "kendall_w_concordance",
    # tier 4 (catalog_r9d): distribution & sketch audits
    "gini_lorenz_audit",
    "ddsketch_quantile_audit",
    "poisson_zero_inflation_audit",
    # tier 5 (catalog_r9e): ANN index health & graph structure
    "ivf_cell_balance_audit",
    "ivf_nprobe_recall_curve",
    "pq_distortion_audit",
    "degree_assortativity",
    # tier 6 (catalog_r9f): text pipeline
    "trigram_novelty_curve",
    "shingle_containment_pairs",
    "tokenizer_fertility_by_source",
    # tier 7 (catalog_r9g): post-slot extras, round-10 promotion pool
    "anderson_darling_2sample",
    "page_hinkley_drift",
    "theil_sen_ci",
    "kendall_tau_b",
    "median_polish_lite",
    # tier 8 (catalog_r9h): modern dependence, combined tests, EVT
    "chatterjee_xi",
    "lepage_test",
    "quade_test",
    "gumbel_block_maxima",
    "pot_mean_excess",
]

# Round-10 open's full headline set (R9_SET + the round-9 post-freeze
# additions above), frozen for round-11+ per-query deltas — the same
# freeze-at-open protocol as R9_SET (VERDICT r9 item 2: the freeze must
# postdate the last perf commit of the PREVIOUS round, which this one
# does by construction).
R10_SET = list(HEADLINE)

# Post-freeze round-10 additions (kept out of R10_SET so its
# cross-round deltas stay comparable; they still run and report
# per-query times).
HEADLINE += [
    # tier 1 (catalog_r10a): robust location/scale/outlier estimators
    "qn_scale_estimator",
    "sn_scale_estimator",
    "biweight_midvariance",
    "trimean_bowley_skew",
    "medcouple_skew_lite",
    "hampel_outlier_flags",
    "repeated_median_slope",
    "yuen_trimmed_t",
    # tier 2 (catalog_r10b): time-series second wave
    "von_neumann_ratio",
    "bartels_rank_test",
    "foster_stuart_records",
    "mosum_changepoint",
    "runs_up_down_test",
    "holt_damped_forecast",
    "theta_forecast",
    "seasonal_strength_audit",
    # tier 3 (catalog_r10c): categorical association & multiplicity
    "bowker_symmetry_test",
    "stuart_maxwell_test",
    "lambda_goodman_kruskal",
    "goodman_kruskal_tau",
    "theil_uncertainty_coeff",
    "yules_q_y",
    "newcombe_diff_ci",
    "benjamini_yekutieli_audit",
    # tier 4 (catalog_r10d): ANN index health / graph / layout
    "hdbscan_core_distances",
    "knn_reciprocity_audit",
    "centroid_drift_audit",
    "cosine_dot_topk_overlap",
    "ann_contrast_audit",
    "graph_degree_gini",
    "range_partition_planner",
    "doc_length_lognormal_fit",
    # tier 5 (catalog_r10e): corpus distribution analytics
    "kl_source_divergence",
    "js_divergence_sources",
    "msttr_lexical_diversity",
    "stopword_chi2_drift",
    "hapax_ratio_by_source",
    # tier 6 (catalog_r10f): CDC chunk dedup + streaming twin
    "cdc_chunk_dedup",
    "cross_source_ngram_overlap",
    "watermark_dedup_batch_twin",
    # tier 7 (catalog_r10g): dependence & concordance second wave
    "hoeffding_d",
    "distance_correlation_lite",
    "blomqvist_beta",
    "spearman_footrule",
    "mann_kendall_test",
    "cucconi_test",
    "cronbach_alpha",
    "stuart_tau_c",
    # tier 8 (catalog_r10h): inequality / concentration / sketch
    "hoover_index",
    "gini_mean_difference",
    "atkinson_index",
    "theil_t_decomposition",
    "palma_ratio",
    "lorenz_asymmetry",
    "hill_diversity_numbers",
    "kmv_distinct_audit",
    # tier 9 (catalog_r10i): vocabulary statistics & keyness
    "yule_k_vocabulary",
    "honore_sichel_richness",
    "good_turing_smoothing",
    "log_likelihood_keyness",
    "gries_dp_dispersion",
    "repetition_ngram_ratio",
    # tier 10 (catalog_r10j): collocations, entropy rate, embedding
    # geometry, sketch merge
    "pmi_collocations",
    "char_entropy_rate",
    "embedding_anisotropy_audit",
    "kmv_merge_audit",
]

# Round-11 open's full headline set, frozen for round-12+ per-query
# deltas (same freeze-at-open protocol as R9_SET/R10_SET).
R11_SET = list(HEADLINE)

# Post-freeze round-11 additions (kept out of R11_SET so its
# cross-round deltas stay comparable).
HEADLINE += [
    # tier 1 (catalog_r11a): two-sample / distribution shape
    "cramer_von_mises_2sample",
    "bws_test",
    "siegel_tukey_test",
    "dagostino_k2_test",
    "poisson_rate_ratio_ci",
    "l_moments_ratios",
    # tier 2 (catalog_r11b): agreement & method comparison
    "krippendorff_alpha_nominal",
    "gwet_ac1_agreement",
    "weighted_kappa_ordinal",
    "lins_ccc",
    "bland_altman_agreement",
    "deming_regression",
    # tier 3 (catalog_r11c): spatial autocorrelation & sequence
    "moran_i_region",
    "geary_c_region",
    "join_count_bw_region",
    "markov_transition_entropy",
    "markov_stationary_dist",
    "edwards_seasonality_test",
    # tier 4 (catalog_r11d): ranking quality / richness / tail risk
    "rbo_ranking_overlap",
    "map_mrr_ann_audit",
    "ace_richness_estimate",
    "chao_shared_species",
    "quantile_treatment_effects",
    "expected_shortfall_cvar",
]

# Queries with MEASURED ≥2× same-code run variance (PERF.md noise
# quantification; VERDICT r9 item 3): their warm number is always a
# median-of-3, even when SPARK_GRAFT_BENCH_REPEAT is unset, so a
# single scheduler hiccup can't print a phantom regression into the
# headline artifact.
NOISY_MOVERS = {
    "fuzzy_pairs_blocked",
    "mmr_diversified_rerank",
    "entity_components_star",
    "hits_hub_authority",
}


def _bench_set(all_queries: dict) -> list[str]:
    """SPARK_GRAFT_BENCH_SET=full widens the run to EVERY catalog query
    (headline order first, then the remaining extras alphabetically);
    default stays the curated HEADLINE list so per-round wall budgets
    and cross-round deltas are unaffected."""
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        # Targeted micro-bench: comma-separated query names, run in the
        # given order (pairs with SPARK_GRAFT_BENCH_REPEAT for
        # median-of-k regression triage).
        return [q.strip() for q in only.split(",") if q.strip()]
    mode = os.environ.get("SPARK_GRAFT_BENCH_SET", "").lower()
    if mode == "r9set":
        # Frozen-set comparison runs (median-of-3 protocol): only the
        # R9_SET queries, so a 3× repeat stays inside a round's budget.
        return list(R9_SET)
    if mode == "r10set":
        return list(R10_SET)
    if mode == "r11set":
        return list(R11_SET)
    if mode != "full":
        return HEADLINE
    rest = sorted(set(all_queries) - set(HEADLINE))
    return HEADLINE + rest


def _stage_stats(base: str, app_id: str) -> dict[int, dict]:
    """Completed-stage metrics from the Spark UI REST API, by stageId."""
    import urllib.request

    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages"
    ) as r:
        stages = json.load(r)
    return {
        s["stageId"]: s
        for s in stages
        if s["status"] in ("COMPLETE", "SKIPPED")
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Shuffle accounting via the UI REST API (the number that decides
    # whether a plan survives a 100× scale step).  Optional: degrade to
    # timings-only if the UI is off.
    ui = spark.sparkContext.uiWebUrl
    app_id = None
    if ui:
        try:
            import urllib.request

            with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
                app_id = json.load(r)[0]["id"]
        except Exception:
            app_id = None

    # Warm the JVM/reader paths once so per-query numbers measure the
    # plans, not JIT/classloading of the first query.
    qs["rename_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Same rationale for the Python-worker/Arrow path (r11, disclosed in
    # OPTIMIZATION_r11.md): the first mapInArrow/ArrowEvalPython query
    # otherwise pays worker spawn + numpy/pyarrow import once per app —
    # measured 5–20 s of one-time cost on this sandbox (episodic
    # first-touch fault stalls multiply the import), landing on whichever
    # Arrow-path query happens to run first.  One-time cost, same class
    # as JIT/classloading; per-query numbers should measure the plans.

    def _arrow_warm(batches):
        import numpy  # noqa: F401
        import pyarrow  # noqa: F401

        yield from batches

    spark.range(0, 32, 1, 32).mapInArrow(_arrow_warm, "id bigint").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    shuffle_b: dict[str, int] = {}
    spill_b: dict[str, int] = {}
    for name in _bench_set(qs):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # Queries that persist() intermediates (minhash/ngram signature
        # frames) would otherwise leak cached blocks into every later
        # measurement — growing GC pressure made late queries 2-4× noisier
        # run-to-run.  Each query is measured from a clean cache.
        spark.catalog.clearCache()
        # Second run: identical plan → codegen cache hits, so this
        # measures the data-proportional work.  cold − warm ≈ fixed
        # per-plan overhead (analysis + codegen), which amortizes to
        # nothing at real scale; warm is the number that extrapolates.
        before = set(_stage_stats(ui, app_id)) if app_id else set()
        # SPARK_GRAFT_BENCH_REPEAT=k measures the warm time as the
        # MEDIAN of k identical executions (default 1) — the frozen-set
        # protocol VERDICT r8 item 2 asked for, so one scheduler hiccup
        # (the 2.2× fuzzy_pairs_blocked swing of PERF.md) can't print a
        # phantom regression into a cross-round comparison.
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "1")))
        if name in NOISY_MOVERS:
            # Measured ≥2× same-code swing (PERF.md): these four always
            # take the median-of-3 even in single-rep headline runs
            # (VERDICT r9 item 3).
            reps = max(reps, 3)
        times = []
        for _rep in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
            if _rep < reps - 1:
                spark.catalog.clearCache()
        times.sort()
        warm[name] = round(times[len(times) // 2], 3)
        if app_id:
            try:
                stats = _stage_stats(ui, app_id)
                new_complete = [
                    s
                    for sid, s in stats.items()
                    if sid not in before and s["status"] == "COMPLETE"
                ]
                # The stage snapshot brackets ALL `reps` executions and
                # each rep runs identical stages, so normalize by reps —
                # otherwise REPEAT=3 artifacts report 3× the shuffle of
                # REPEAT=1 rounds and cross-round comparison breaks
                # (ADVICE r9).
                shuffle_b[name] = (
                    sum(s.get("shuffleWriteBytes", 0) for s in new_complete)
                    // reps
                )
                spill_b[name] = (
                    sum(
                        s.get("memoryBytesSpilled", 0)
                        + s.get("diskBytesSpilled", 0)
                        for s in new_complete
                    )
                    // reps
                )
            except Exception:
                pass
        spark.catalog.clearCache()

    # ANN quality: recall of the pruned IVF search against the exact
    # brute-force top-10 (tiny collects — both results are <= 20 rows).
    exact = [
        r.neighbor_id
        for r in qs["similarity_topk"](spark, sf_dir).collect()
        if r.query_id == 0
    ]
    ivf = [r.neighbor_id for r in qs["ivf_search"](spark, sf_dir).collect()]
    ivf_recall = round(len(set(exact) & set(ivf)) / max(len(exact), 1), 3)
    # Learned-centroid IVF (k-means cells). Not in HEADLINE timings for
    # the same reason as grouped_zscore_pandas: the iterative fit is a
    # driver-orchestrated loop measured separately (see PERF.md); recall
    # is the quality signal that matters.
    kmivf = [
        r.neighbor_id for r in qs["ivf_kmeans_search"](spark, sf_dir).collect()
    ]
    kmivf_recall = round(len(set(exact) & set(kmivf)) / max(len(exact), 1), 3)

    # PQ quality: the ADC distance approximates squared L2, so its
    # reference is the exact squared-L2 top-10 (not the cosine list).
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.pq import _sq_dist

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter("vec_id = 0").select(
        F.col("embedding").cast("array<double>").alias("__q")
    )
    exact_l2 = [
        r.vec_id
        for r in emb.crossJoin(F.broadcast(qv))
        .filter("vec_id != 0")
        .select(
            "vec_id",
            _sq_dist(F.col("embedding").cast("array<double>"), F.col("__q")).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .collect()
    ]
    adc_ids = [r.neighbor_id for r in qs["pq_search"](spark, sf_dir).collect()]
    pq_adc_recall = round(len(set(exact_l2) & set(adc_ids)) / max(len(exact_l2), 1), 3)
    rr_ids = [
        r.neighbor_id for r in qs["pq_search_rerank"](spark, sf_dir).collect()
    ]
    pq_recall = round(len(set(exact_l2) & set(rr_ids)) / max(len(exact_l2), 1), 3)
    ivfpq_ids = [
        r.neighbor_id for r in qs["ivfpq_search"](spark, sf_dir).collect()
    ]
    ivfpq_recall = round(
        len(set(exact_l2) & set(ivfpq_ids)) / max(len(exact_l2), 1), 3
    )
    ivfpqr_ids = [
        r.neighbor_id
        for r in qs["ivfpq_residual_search"](spark, sf_dir).collect()
    ]
    ivfpqr_recall = round(
        len(set(exact_l2) & set(ivfpqr_ids)) / max(len(exact_l2), 1), 3
    )

    # Multi-query recall: the single-query numbers above move in 0.1
    # steps (one neighbor of ten), so pq_recall_mq averages PQ re-rank
    # recall over three query vectors via the operator API — the
    # robustness check that a good single-query number isn't luck.
    from beacon_data_importer_spark.operators.pq import pq_search_rerank

    n_vecs_total = emb.count()
    mq_recalls = []
    for qid in (0, 7, 123):
        if qid >= n_vecs_total:
            continue
        qrow = emb.filter(f"vec_id = {qid}")
        qv_i = qrow.select(
            F.col("embedding").cast("array<double>").alias("__q")
        )
        exact_i = [
            r.vec_id
            for r in emb.crossJoin(F.broadcast(qv_i))
            .filter(f"vec_id != {qid}")
            .select(
                "vec_id",
                _sq_dist(
                    F.col("embedding").cast("array<double>"), F.col("__q")
                ).alias("__d"),
            )
            .orderBy("__d", "vec_id")
            .limit(10)
            .collect()
        ]
        got_i = [
            r.neighbor_id
            for r in pq_search_rerank(
                emb, qrow, k=10, shortlist=200, exclude_id=qid
            ).collect()
        ]
        mq_recalls.append(len(set(exact_i) & set(got_i)) / max(len(exact_i), 1))
    pq_recall_mq = round(sum(mq_recalls) / max(len(mq_recalls), 1), 3)

    # Hard-negative mining quality: agreement of the IVF cell-join
    # variant's mined (pos, neg) pairs with the brute-exact truth —
    # the recall row VERDICT r6 item 4 asked for.  One 1-row collect;
    # the audit query itself does the per-query join.
    hnm_row = qs["hard_negative_recall_audit"](spark, sf_dir).collect()[0]
    hnm_pos_agree = round(hnm_row.pos_agree / max(hnm_row.n_queries, 1), 3)
    hnm_neg_agree = round(hnm_row.neg_agree / max(hnm_row.n_queries, 1), 3)
    # Ratio-scaled variant (VERDICT r7 item 4): must hold ≥0.9.
    hnms_row = qs["hard_negative_scaled_recall_audit"](spark, sf_dir).collect()[0]
    hnms_pos_agree = round(hnms_row.pos_agree / max(hnms_row.n_queries, 1), 3)
    hnms_neg_agree = round(hnms_row.neg_agree / max(hnms_row.n_queries, 1), 3)

    # Peak JVM heap across executors (single-JVM locally): the "does it
    # fit in executor memory at this SF" signal next to spill bytes.
    peak_heap = None
    if app_id:
        try:
            import urllib.request

            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/executors"
            ) as r:
                execs = json.load(r)
            peak_heap = max(
                (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0))
                for e in execs
            )
        except Exception:
            peak_heap = None

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # Key ORDER is deliberate: the round-2 driver recorded only the TAIL
    # of this (single) JSON line, so the per-query detail dicts go FIRST
    # and the headline fields (metric/value/totals/quality) go LAST —
    # under tail truncation the decision-bearing numbers survive.  The
    # spill dict keeps only NONZERO entries (usually none) to shrink the
    # line; spill_total_b still reports the full sum.
    # Once-per-session staged-frame build time (r12, VERDICT r11 #3):
    # the shared staging plans (corpus LSH signatures/pairs, co-purchase
    # edges, ER fuzzy pairs) build inside whichever timed query runs
    # first, so per-query numbers misattributed ~8-10 s.  Reporting the
    # build cost as its own line item makes the per-query numbers
    # self-consistent; the timed queries, reps, and sink are unchanged.
    from beacon_data_importer_spark.plans.staging_meter import STAGING_SEC

    payload = json.dumps(
            {
                "staging_sec_detail": dict(STAGING_SEC),
                "staging_sec": round(sum(STAGING_SEC.values()), 3),
                # Bytes written to shuffle per query (warm run, all stages).
                # Scale-safety signal: aggregations should shuffle O(groups),
                # LSH O(docs × bands) — never O(input bytes).
                "shuffle_write_b": shuffle_b,
                "queries": timings,
                "queries_warm": warm,
                # Spill per query (memory+disk, warm run): anything nonzero
                # here means partitions outgrew executor memory at this SF.
                "spill_b_nonzero": {k: v for k, v in spill_b.items() if v},
                "spill_total_b": sum(spill_b.values()),
                "shuffle_write_total_b": sum(shuffle_b.values()),
                "peak_jvm_heap_b": peak_heap,
                "quality": {
                    "ivf_recall_at_10": ivf_recall,
                    "kmeans_ivf_recall_at_10": kmivf_recall,
                    "pq_recall_at_10": pq_recall,
                    "pq_adc_recall_at_10": pq_adc_recall,
                    "ivfpq_recall_at_10": ivfpq_recall,
                    "ivfpq_residual_recall_at_10": ivfpqr_recall,
                    "pq_recall_at_10_3q_mean": pq_recall_mq,
                    "hnm_ivf_pos_agree": hnm_pos_agree,
                    "hnm_ivf_neg_agree": hnm_neg_agree,
                    "hnm_scaled_pos_agree": hnms_pos_agree,
                    "hnm_scaled_neg_agree": hnms_neg_agree,
                },
                "warm_total_r1_set": round(
                    sum(warm[n] for n in R1_SET if n in warm), 3
                ),
                "warm_total_r2_set": round(
                    sum(warm[n] for n in R2_SET if n in warm), 3
                ),
                "warm_total_r3_set": round(
                    sum(warm[n] for n in R3_SET if n in warm), 3
                ),
                "warm_total_r4_base_set": round(
                    sum(warm[n] for n in R4_BASE_SET if n in warm), 3
                ),
                "warm_total_r4_set": round(
                    sum(warm[n] for n in R4_SET if n in warm), 3
                ),
                "warm_total_r5_base_set": round(
                    sum(warm[n] for n in R5_BASE_SET if n in warm), 3
                ),
                "warm_total_r5_set": round(
                    sum(warm[n] for n in R5_SET if n in warm), 3
                ),
                "warm_total_r6_set": round(
                    sum(warm[n] for n in R6_SET if n in warm), 3
                ),
                "warm_total_r7_set": round(
                    sum(warm[n] for n in R7_SET if n in warm), 3
                ),
                "warm_total_r8_set": round(
                    sum(warm[n] for n in R8_SET if n in warm), 3
                ),
                "warm_total_r9_set": round(
                    sum(warm[n] for n in R9_SET if n in warm), 3
                ),
                "warm_total_r11_set": round(
                    sum(warm.get(q, 0.0) for q in R11_SET), 3
                ),
                "warm_total_r10_set": round(
                    sum(warm[n] for n in R10_SET if n in warm), 3
                ),
                "warm_total": round(sum(warm.values()), 3),
                "n_queries": len(warm),
                "sf": sf_val,
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "value": round(sum(timings.values()), 3),
            }
    )
    print(payload)
    # VERDICT r8 item 2: the driver's BENCH_r{N}.json truncates this
    # line's tail to 2000 chars, so the per-query table was unauditable
    # from tracked artifacts.  Persist the FULL payload to a repo file
    # (committed at each round close as BENCH_LOCAL_r{N}.json) so
    # cross-round per-query deltas are computable from git alone.
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    if out:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             out),
                "w",
            ) as f:
                f.write(payload + "\n")
        except OSError:
            pass  # read-only checkout: the printed line still has it


if __name__ == "__main__":
    main()
