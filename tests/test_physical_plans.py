"""Physical-plan regression guards: the plans that make the engine
scale-viable must KEEP their shape — pushdown reaching the scan,
broadcast where declared, bucketed joins avoiding the exchange,
partition pruning on partitioned layouts."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_explain(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    q = entrymod.queries()["filter_compound"]
    txt = optimized_explain(q(spark, sf_dir))
    assert "PushedFilters:" in txt
    assert "GreaterThanOrEqual(l_quantity,10.0)" in txt
    # column pruning: only the 6 needed columns in ReadSchema
    assert "l_tax" not in txt.split("ReadSchema")[1].splitlines()[0]


def test_topk_join_uses_broadcast_and_takeordered(spark, sf_dir):
    q = entrymod.queries()["top_revenue"]
    txt = optimized_explain(q(spark, sf_dir))
    assert "BroadcastHashJoin" in txt
    assert "TakeOrderedAndProject" in txt


def test_qa_left_join_is_broadcast(spark, sf_dir):
    q = entrymod.queries()["qa_left_joins"]
    txt = optimized_explain(q(spark, sf_dir))
    assert "BroadcastHashJoin LeftOuter" in txt


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located join: two tables bucketed on the join key join without
    any Exchange — the pre-partitioning strategy for repeated big joins
    at scale (SURVEY's 'bucketing for co-located joins')."""
    from beacon_data_importer_spark.sources.parquet import read_table

    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    for name, df, key in (("b_orders", o, "o_orderkey"), ("b_lineitem", l, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    try:
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey
            == spark.table("b_lineitem").l_orderkey,
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket co-location
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partition layout: a filter on the partition column must
    prune at planning time (PartitionFilters), reading only matching
    directories."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.sources.parquet import read_table

    out = str(tmp_path / "events_by_type")
    e = read_table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    txt = optimized_explain(back)
    assert "PartitionFilters" in txt and "event_type" in txt
    n_click = back.count()
    assert n_click == e.filter(F.col("event_type") == "click").count()
    assert n_click > 0


def test_quota_cap_single_exchange(spark, sf_dir):
    """The quota-cap window and its filter must share ONE shuffle on the
    group key — a second exchange would double the operator's cost."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.functions.expressions import portable_hash64
    from beacon_data_importer_spark.operators.sampling import quota_cap
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        portable_hash64(F.col("doc_id").cast("string"), seed=1).alias("__h"),
    )
    plan = quota_cap(d, "source", "__h", 15)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Sequence packing = one shuffle on the shard key; the running sum
    and the floor-div pack id live in the same window stage."""
    from beacon_data_importer_spark.operators.sampling import pack_sequences
    from beacon_data_importer_spark.operators.text import token_count_ws
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tokens")
    )
    plan = pack_sequences(d, "doc_id", "n_tokens", 512)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan


def test_split_assign_is_map_only(spark, sf_dir):
    """The split assignment is a pure projection — zero exchanges; at
    100 TB it runs at scan speed."""
    from beacon_data_importer_spark.operators.sampling import split_assign
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", split_assign("doc_id").alias("split")
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pack_bins_serpentine_single_exchange(spark, sf_dir):
    """Serpentine binning's per-shard total, rank, and snake index all
    ride ONE shuffle on the shard key — the two window frames share the
    partitioning, so a second exchange would be a planner regression."""
    from beacon_data_importer_spark.operators.sampling import (
        pack_bins_serpentine,
    )
    from beacon_data_importer_spark.operators.text import token_count_ws
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tokens")
    )
    plan = (
        pack_bins_serpentine(d, "doc_id", "n_tokens", 512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan


def test_stratified_sample_targets_are_broadcast(spark, sf_dir):
    """The per-stratum target config must join as a broadcast (it is
    dim-sized by definition); the only exchange is the stratum window."""
    from beacon_data_importer_spark.operators.sampling import (
        stratified_sample_exact,
    )
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    targets = spark.createDataFrame(
        [("en", 10), ("de", 10)], "lang string, target_n int"
    )
    plan = (
        stratified_sample_exact(d, "lang", targets, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 1, plan


def test_mixture_config_join_is_broadcast_map_only(spark, sf_dir):
    """Config-table mixture sampling: broadcast join + filter, zero
    shuffle exchanges — the keep decision runs at scan speed."""
    from beacon_data_importer_spark.operators.sampling import (
        mixture_sample_config,
    )
    from beacon_data_importer_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = spark.createDataFrame(
        [("src0", 5000)], "source string, rate_bp int"
    )
    plan = (
        mixture_sample_config(d, "doc_id", "source", rates, default_rate_bp=1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 0, plan


def test_q6_filters_reach_the_scan(spark, sf_dir):
    """TPC-H Q6 is the pushdown probe: all three predicates must appear
    as PushedFilters and the scan must read only the four used columns."""
    from beacon_data_importer_spark.catalog_r3 import q_forecast_revenue_q6

    df = q_forecast_revenue_q6(spark, sf_dir)
    txt = df._jdf.queryExecution().toString()
    scan = [ln for ln in txt.splitlines() if "FileScan parquet" in ln][-1]
    assert "l_shipdate" in scan and "l_discount" in scan, scan
    assert "PushedFilters: []" not in txt
    # column pruning: no unused lineitem columns in the scan schema
    for unused in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert unused not in scan, scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # only the single-partition partial-agg merge remains
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 1, plan


def test_q19_disjunction_is_broadcast_no_cartesian(spark, sf_dir):
    """TPC-H Q19's OR-of-ANDs must stay an equi broadcast join on
    partkey with the disjunction as a residual filter — never a
    cartesian/BNL join."""
    from beacon_data_importer_spark.catalog_r3 import (
        q_brand_bracket_revenue_q19,
    )

    plan = (
        q_brand_bracket_revenue_q19(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_all_catalog_plans_stay_jvm_side():
    """Whole-catalog structural guard: no query's plan may contain a
    Python evaluation node or a cartesian product unless it is on the
    documented allowlist — the 'UDFs are the slow path' rule as CI.
    (Broadcast nested-loop joins of 1-row bounds frames are fine and
    not counted; this catches accidental row-at-a-time UDFs and
    unconstrained joins sneaking into new queries.)

    Reads PLAN_AUDIT.json instead of re-explaining all 300+ plans
    live (which cost 94 s of every suite run — VERDICT r6 item 8):
    `tools/presnapshot.py --fix` regenerates the artifact whenever the
    query-name set OR the plan-shaping source hash drifts (the
    source_sha field — ADVICE r7 closed the edit-an-existing-query
    staleness gap), test_plan_audit_artifact_covers_whole_catalog pins
    its name set to the catalog exactly, and explain_audit.py counts
    the same markers this test used to grep (BatchEvalPython and
    CartesianProduct included)."""
    import json
    import pathlib

    PYTHON_SANCTIONED = {
        "multimodal_decode",        # Arrow mapInPandas by design (stub codecs)
        "multimodal_frame_sample",  # same mapInPandas path + 1->N frame fan-out
        "multimodal_resize_plan",   # decode_media feeds the Column-only resize math
        "multimodal_frame_stats",   # same surface
        "grouped_zscore_pandas",    # exists to MEASURE the escape hatch
        "pack_bins_bestfit",        # sequential placement loop (ROWS_ONLY)
        "flatmap_attempts_udtf",    # exists to demonstrate the UDTF path
    }
    audit = json.loads(
        (pathlib.Path(__file__).parent.parent / "PLAN_AUDIT.json").read_text()
    )
    offenders: dict[str, str] = {}
    for name, p in audit["plans"].items():
        if "error" in p:
            continue  # test_plan_audit_covers_catalog fails on these
        if name not in PYTHON_SANCTIONED and p.get("python_evals", 0) > 0:
            offenders[name] = "python_eval"
        if p.get("cartesian_products", 0) > 0:
            offenders[name] = "cartesian_product"
    assert not offenders, f"non-sanctioned plan features: {offenders}"


def test_forward_fill_single_exchange(spark, sf_dir):
    """LOCF is one user_id exchange + one in-partition running window —
    any second exchange is a regression."""
    import re

    df = entrymod.queries()["forward_fill_events"](spark, sf_dir)
    txt = optimized_explain(df)
    # formatted explain lists each node twice (tree + details): count
    # the numbered detail headers only
    assert len(re.findall(r"\(\d+\) Exchange", txt)) == 1, txt


def test_skew_salted_join_keeps_the_shuffle_shape(spark, sf_dir):
    """The salted join must stay a sort-merge join on (key, salt) —
    a broadcast here would silently collapse the exchange the salt
    exists to reshape (the merge hint pins it)."""
    df = entrymod.queries()["skew_salted_join"](spark, sf_dir)
    txt = optimized_explain(df)
    assert "SortMergeJoin" in txt, txt
    assert "BroadcastHashJoin" not in txt, txt


def test_debounce_reuses_one_composite_exchange(spark, sf_dir):
    """lag + running burst-id sum + final group-by all share the
    (user_id, event_type) partitioning: exactly one exchange."""
    import re

    df = entrymod.queries()["event_debounce"](spark, sf_dir)
    txt = optimized_explain(df)
    assert len(re.findall(r"\(\d+\) Exchange", txt)) == 1, txt


def test_bm25_broadcasts_statistics(spark, sf_dir):
    """Document frequencies and corpus stats are broadcast; the only
    hash exchanges carry postings/doc aggregates, and the top-k is a
    TakeOrdered, never a global sort."""
    df = entrymod.queries()["bm25_search"](spark, sf_dir)
    txt = optimized_explain(df)
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt
    assert "TakeOrderedAndProject" in txt, txt


def test_plan_audit_artifact_covers_whole_catalog():
    """PLAN_AUDIT.json drift guard (VERDICT r4 / ADVICE r4 item 1):
    the committed plan-audit artifact must carry exactly one entry per
    catalog query — a query added without regenerating the audit
    (tools/explain_audit.py) fails here instead of silently shipping
    unaudited, and no audited entry may record an explain-time error."""
    import json
    import pathlib

    audit = json.loads(
        (pathlib.Path(__file__).parent.parent / "PLAN_AUDIT.json").read_text()
    )
    audited = set(audit["plans"])
    catalog = set(entrymod.queries())
    missing = sorted(catalog - audited)
    stale = sorted(audited - catalog)
    assert not missing and not stale, (
        f"PLAN_AUDIT.json drifted: missing={missing} stale={stale} — "
        "regenerate with tools/explain_audit.py"
    )
    errored = sorted(
        n for n, p in audit["plans"].items() if "error" in p
    )
    assert not errored, f"explain failed for: {errored}"


def test_no_single_partition_windows():
    """VERDICT r7 item 3's mechanical bar: an ordered window with an
    EMPTY partition spec (``global_order_windows`` in PLAN_AUDIT,
    counted from windowspecdefinition args) forces an Exchange
    SinglePartition and sorts its whole frame on ONE task.
    word_burstiness_audit had this over a vocabulary-sized frame and
    was rewritten to ``orderBy().limit()`` (TakeOrderedAndProject).

    The guard is a RATCHET, not a blanket ban: global-order windows
    over frames BOUNDED by construction are a legitimate device the
    catalog uses deliberately (per-day grids ≤ a few thousand rows,
    distinct-value rank maps — see _spark_rank2's docstring, bucket
    summaries like pareto_skyline's, per-cell shortlists).  Every
    query below was audited bounded-frame at round-8 open; a NEW
    query that introduces a global-order window fails here until its
    frame-boundedness is reviewed and the name is added."""
    import json
    import pathlib

    BOUNDED_FRAME_AUDITED = {
        # rank maps on distinct values / tie-averaged rank machinery
        "spearman_rho", "kruskal_wallis", "auc_mann_whitney",
        "ks_two_sample", "logrank_test", "runs_test", "grubbs_outlier",
        # r8c: cumsum over DISTINCT $1000-buckets (price-range-bounded)
        # and over DISTINCT latency days (calendar-bounded ~120 rows)
        "mood_median_test", "weibull_survival_fit",
        # r8g: midrank maps over DISTINCT $10-bucket frames
        "dunn_posthoc", "ansari_bradley",
        "winsorized_mean_revenue", "emd_drift_audit", "chow_break_test",
        "best_split_finder", "isotonic_calibration",
        # per-day / per-period grids (calendar-bounded)
        "yoy_growth", "ewma_daily_revenue", "acf_daily_revenue",
        "holt_linear_forecast", "holt_winters_seasonal",
        "stl_decomposition_lite",
        # r8f: U_t cumsum over calendar days + midranks over the
        # distinct daily-revenue values (both calendar-bounded)
        "pettitt_changepoint",
        # r8h: row_number index over the calendar-day frame feeding
        # the R/S block grid
        "hurst_exponent",
        # r8i: KPSS partial-sum cumsum over the calendar-day frame
        "kpss_stationarity",
        # r8j: cumulative histogram over the DISTINCT $10-bucket frame
        "median_ci_order_stat",
        # r8l: LLR cumulative walk over the calendar-day frame
        "sprt_boundary_crossing",
        # r9a: ≤12-row distinct-|d| rank frame (wilcoxon); row_number /
        # offset indexes over the calendar-day frame (cox_stuart,
        # turning_points); strictly-less cumulatives over the DISTINCT
        # $10-bucket frame (brunner_munzel, cliffs_delta — the
        # dunn/ansari class); cumulative over the bounded distinct-diff
        # frame of the $1000-bucket histogram cross (hodges_lehmann)
        "wilcoxon_signed_rank", "cox_stuart_trend",
        "turning_points_test", "brunner_munzel", "cliffs_delta_effect",
        "hodges_lehmann_shift",
        # r9b: calendar-day-frame walks — error cumulatives
        # (tracking_signal), ordinal-pattern index (permutation_entropy),
        # 7-lag EWMA window (ewma_control_chart), ≤252 distinct
        # same-month slopes (sen_slope_seasonal)
        "tracking_signal_audit", "permutation_entropy",
        "ewma_control_chart", "sen_slope_seasonal",
        # r9d: cumulatives over the DISTINCT $1000-bucket frame (gini)
        # and the octave×8 sketch-bucket / distinct-value frames
        # (ddsketch — price-range-bounded)
        "gini_lorenz_audit", "ddsketch_quantile_audit",
        # r9e: cell rank over the nlist-bounded centroid frame
        "ivf_nprobe_recall_curve",
        # r9g: AD strata over the DISTINCT $10-bucket frame (the
        # brunner/cliffs class); Page-Hinkley cumulative walks over the
        # calendar-day frame; Theil-Sen CI order statistics over the
        # ≤C(n_months,2) distinct-slope frame + month row_number
        "anderson_darling_2sample", "page_hinkley_drift",
        "theil_sen_ci",
        # r9h: calendar-index sequences + distinct-value cumulative
        # rank maps (chatterjee); $10-bucket histogram moments
        # (lepage); bounded month-range rank (quade); distinct-value
        # threshold cumulative (pot)
        "chatterjee_xi", "lepage_test", "quade_test",
        "pot_mean_excess",
        # r10a: robust estimators — pairwise-gap / kernel / per-i-median
        # ranks over C(days,2)-bounded frames (calendar-bounded, the
        # theil_sen class) and n-row median ranks over the calendar-day
        # frame; yuen's cumulative runs on the DISTINCT $10-bucket
        # frame (the dunn/ansari class)
        "qn_scale_estimator", "sn_scale_estimator",
        "biweight_midvariance", "trimean_bowley_skew",
        "medcouple_skew_lite", "repeated_median_slope",
        "yuen_trimmed_t",
        # r10b: lag/rank/running-extreme/fixed-width-sum walks over the
        # calendar-day frame (the pettitt/ewma class) and month-frame
        # recursion bases (the holt_linear class)
        "von_neumann_ratio", "bartels_rank_test",
        "foster_stuart_records", "mosum_changepoint",
        "runs_up_down_test", "holt_damped_forecast", "theta_forecast",
        "seasonal_strength_audit",
        # r11a: cumulative windows over the DISTINCT $10-bucket frame
        # (cvm/bws/siegel_tukey — the dunn/ansari class) and the
        # rank map over the calendar-day frame (l_moments)
        "cramer_von_mises_2sample", "bws_test", "siegel_tukey_test",
        "l_moments_ratios",
        # r11c: 25-row nation rank (join_count)
        "join_count_bw_region",
        # r11d: top-2-source rank over the 20-source frame
        # (chao_shared); $10-bucket decile reads (qte — the median_ci
        # class); calendar-day tail rank (cvar).  rbo_ranking_overlap
        # computes TakeOrdered depth-20 prefixes first; the remaining
        # row_number windows run over those LIMIT-20 frames — bounded
        # by the literal k, not by data.
        "chao_shared_species", "rbo_ranking_overlap",
        "quantile_treatment_effects", "expected_shortfall_cvar",
        # r10c: p-rank over the ≤25-nation test frame (the
        # holm/fdr_bh class)
        "benjamini_yekutieli_audit",
        # r10d: cumulatives over bounded histogram frames — distinct
        # supplier degrees (graph_degree_gini), $10 price buckets +
        # the 32-row partition-id lag (range_partition_planner),
        # distinct doc lengths (doc_length_lognormal_fit)
        "graph_degree_gini", "range_partition_planner",
        "doc_length_lognormal_fit",
        # r10g: rank maps over the calendar-day frame — (t) and (y, t)
        # row_numbers feeding Hoeffding's D / footrule / Blomqvist
        # medians (the cox_stuart/turning_points class); cucconi runs
        # the cumulative over the DISTINCT $10-bucket frame (the
        # dunn/ansari/lepage class)
        "hoeffding_d", "blomqvist_beta", "spearman_footrule",
        "cucconi_test",
        # r10h: the gini_lorenz_audit cumulative over the DISTINCT
        # $1000-bucket customer-revenue frame (price-range-bounded)
        "gini_mean_difference", "palma_ratio",
        "cusum_changepoints", "max_concurrent_orders", "late_data_audit",
        "conversion_hazard", "kaplan_meier", "nelson_aalen_hazard",
        "mase_forecast_audit", "interim_analysis_audit",
        # bounded statistic / summary tables
        "holm_bonferroni", "fdr_bh_audit", "neyman_allocation",
        "score_calibration", "brier_decomposition", "qini_uplift",
        "equidepth_histogram", "psi_drift_audit", "heaps_law_fit",
        "zipf_slope_audit", "heavy_hitters_audit", "pinball_quantile_eval",
        "pareto_frontier", "pareto_skyline", "rfm_segments",
        "lang_profile_score", "t_closeness_audit", "chi_square_independence",
        "ipf_raking_weights", "shapley_attribution", "blocking_recall_audit",
        "sorted_neighborhood_pairs", "decayed_topk",
        # per-query ANN shortlists (k-bounded) / layout keys
        "ivf_search", "ivf_kmeans_search", "ivfpq_search",
        "ivfpq_residual_search", "rrf_hybrid_search", "ann_ndcg_audit",
        "zorder_layout", "zonemap_skip_audit", "surrogate_returning",
        "source_top_terms", "temperature_mixture_sample", "region_share",
        "last_touch_attribution",
    }
    audit = json.loads(
        (pathlib.Path(__file__).parent.parent / "PLAN_AUDIT.json").read_text()
    )
    offenders = sorted(
        n
        for n, p in audit["plans"].items()
        if "error" not in p
        and n not in BOUNDED_FRAME_AUDITED
        and p.get("global_order_windows", 0) > 0
    )
    assert not offenders, (
        f"NEW global-order windows (sort the whole frame on ONE task): "
        f"{offenders} — use orderBy().limit() / partitionBy / the "
        f"operators/order.py range-partitioned devices, or document "
        f"frame-boundedness and add to BOUNDED_FRAME_AUDITED"
    )


def test_queries_md_index_is_fresh():
    """QUERIES.md drift guard (VERDICT r5 items 1/4): the committed
    provenance index must be byte-identical to a fresh
    tools/gen_query_index.py run — stale counts or stale registration
    flags fail here before they ship.  `python tools/presnapshot.py
    --fix` regenerates everything this and the plan-audit guard check.

    Runs gen_query_index IN-PROCESS (import + captured stdout) — the
    generator is deterministic pure-Python over the catalog registry
    and git-tracked artifacts, so a subprocess added a full pyspark
    import (~10 s of every suite run, VERDICT r6 item 8) without
    adding isolation the assertion needs."""
    import importlib.util
    import io
    import pathlib
    import sys
    from contextlib import redirect_stdout

    repo = pathlib.Path(__file__).parent.parent
    spec = importlib.util.spec_from_file_location(
        "gen_query_index", str(repo / "tools" / "gen_query_index.py")
    )
    gqi = importlib.util.module_from_spec(spec)
    sys.modules["gen_query_index"] = gqi
    spec.loader.exec_module(gqi)
    buf = io.StringIO()
    with redirect_stdout(buf):
        gqi.main()
    fresh = buf.getvalue()
    current = (repo / "QUERIES.md").read_text()
    assert current == fresh, (
        "QUERIES.md is stale — regenerate with "
        "`python tools/gen_query_index.py > QUERIES.md` "
        "(or `python tools/presnapshot.py --fix`)"
    )


def test_bt_pair_width_bound(spark, sf_dir):
    """Mega-order width guard (VERDICT r6 item 5): bradley_terry_rating
    and preference_cycle_audit expand C(L,2) duel pairs per order, so
    their cost is linear in the max lines-per-order L at a fixed row
    budget.  tools/bt_width_probe.py measured the band on this host:
    the expansion stays interactive through L≈500 (600k rows: 3.5 s at
    L=200, 12.6 s at L=1000, 49 s at L=4000) while the O(L·N_nations)
    running-count rewrite stays flat (8.0 s at L=4000).  This guard
    asserts the data is DEEP inside the quadratic-safe band; a dataset
    that trips it needs the rewrite documented in PERF.md, not a
    bigger timeout."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.sources.parquet import read_table

    max_lines = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # Measured: 13 at sf0.01, 17 at sf0.1 — TPC-H proper caps at 7;
    # this generator is looser but still orders of magnitude inside
    # the ≈500 crossover.
    assert max_lines <= 64, (
        f"max lines/order = {max_lines}: approaching the C(L,2) duel "
        "expansion's measured crossover (~500); switch bradley_terry/"
        "preference_cycle to the O(L·N) running-count form "
        "(tools/bt_width_probe.py linear_wall)"
    )
