"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``random_forest_using_hadoop_spark``
package; this module is a thin adapter over its registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

import random_forest_using_hadoop_spark as engine

engine.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2 B19, TPC-H-Q1-shape pricing summary)
    on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return engine.REGISTRY["agg_hash_groupby"].fn(spark, "/root/testdata/sf0.001")


# Grading priority (round 5): the driver grades the FIRST 50 keys in
# dict order. Cumulative r1∪r2∪r3∪r4 evidence: 189/218 pre-round keys
# green (every key green as of its latest grading); the 29 r4
# additions at positions 51-79 of the r4 ordering never got a driver
# row. This round rotates them to the FRONT (after any brand-new r5
# keys, which by convention enter at position 1 so no new key waits a
# round for evidence), and backfills the window with the stalest
# r1-graded keys so their evidence is refreshed under the current
# engine. Overflow = the remaining r1-era keys (stalest first), then
# everything driver-graded r2+ (all green, re-proven by the local
# parity clone each pytest run). Every key appears exactly once.
_GRADE_FIRST = [
    # --- new-in-r5 keys: inserted here, position 1, as they land ---
    "agg_percentile_cont", "agg_changepoint_cusum", "agg_autocorr",
    "win_attribution_touch", "sink_snapshot_timetravel", "scan_file_audit",
    "ml_feature_hash", "text_pmi_collocations", "text_readability",
    "text_char_entropy", "dedup_lsh_audit", "emb_matryoshka_recall",
    "graph_triangle_count", "agg_seasonal_decompose", "agg_theilsen_trend",
    "win_max_drawdown", "join_asof_nearest", "pipe_quality_ablation",
    "text_langid_confusion", "ml_learning_curve", "agg_jackknife_variance",
    # --- r4 additions with zero driver evidence (29 keys) ---
    "agg_entropy", "agg_gini_concentration", "scan_dpp_prune",
    "join_scd2_pointintime", "agg_ols_trend", "agg_percentile_disc",
    "text_bigram_lm", "agg_markov_transition", "agg_basket_pairs",
    "agg_ab_ztest", "agg_rfm_segmentation", "agg_benford_digits",
    "agg_chisq_independence", "win_outlier_mad", "stream_file_sink_exactonce",
    "pipe_ngram_novelty", "emb_drift_monitor", "win_period_over_period",
    "dedup_cluster_histogram", "join_runtime_bloomfilter",
    "pipe_secrets_scan", "scan_corrupt_records", "win_rank_movers",
    "src_json_nested", "agg_mean_family", "pipe_data_profile",
    "win_streak_longest", "agg_pareto_point", "agg_cohort_ltv",
    # --- stalest r1-graded keys: re-grade under the current engine ---
    "scan_parquet", "filter_basic", "project_expr", "limit_topk",
    "sort_multikey", "distinct_rows", "set_union_all",
    "agg_hash_groupby", "join_multiway", "topk_per_group",
    "join_broadcast", "join_sortmerge", "join_outer",
    "agg_grouping_sets", "join_bucketed_colocated", "agg_stats",
    "win_rank", "scan_prune_pushdown", "sink_parquet_part",
    "join_semi", "join_anti",                         # = key #50 (pre-r5)
    # --- late-r5 additions: first in line once the 50-key window of
    # never-graded keys above clears (they head the r6 rotation) ---
    "agg_countmin_heavy", "agg_bloom_membership", "sink_incremental_diff",
    "agg_hll_portable", "src_xml", "pipe_epoch_shuffle",
    "multimodal_audio_codec", "win_sliding_median",
    "win_ohlc_candles", "agg_welch_ttest", "agg_mannwhitney_u", "agg_ks_test",
    "pipe_vocab_coverage", "ml_auc_exact", "agg_spearman_corr",
    "win_bollinger_bands", "win_rsi_indicator", "scan_agg_pushdown", "sink_dictionary_encode",
    "agg_kmv_theta_setops", "agg_log2_histogram",
    "pipe_url_canonical_dedup", "agg_user_path_patterns", "scan_missing_file_resilient",
    "win_gap_fill_interpolate", "agg_percentile_histogram",
    "join_asof_tolerance", "fn_ipv4_subnet", "agg_srm_guard", "ml_decile_lift",
    # --- overflow: remaining r1-era keys (stalest first) ---
    "join_cross", "agg_rollup", "agg_cube",
    "win_moving_rows", "win_range_frame", "win_analytic",
    "scan_schema_evolution", "src_csv_json",
    "sink_range_cluster", "sink_upsert",
    "agg_global", "agg_distinct", "agg_filtered",
    "filter_like_regex", "filter_null_safe",
    "set_union", "set_intersect", "set_except",
    # --- then the r3/r4-graded window of the last two rounds ---
    "fn_try_safe", "src_orc_text", "sample_hash_stratified",
    "text_token_count", "reshape_pivot", "reshape_unpivot",
    "pipe_quality_composite", "pipe_dedup_manifest", "pipe_token_share_curve",
    "agg_heavy_hitters", "src_binaryfile", "win_gaps_islands",
    "pipe_token_rarity", "fn_bitwise", "agg_bitmap_distinct",
    "subquery_lateral", "fn_calendar", "dedup_substring",
    "tpch_q6_forecast_revenue", "tpch_q12_late_shipmode",
    "tpch_q15_top_supplier", "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_supplier", "tpch_q2_min_cost_supplier",
    "tpch_q11_value_share", "tpch_q16_supplier_variety",
    "pipe_pii_scrub", "emb_random_projection",
    "agg_sliding_distinct", "agg_timeseries_densify",
    "dedup_incremental", "win_forward_fill", "agg_decay_weighted",
    "join_null_split", "fn_surrogate_key", "stream_distinct_users",
    "pipe_doc_chunk", "pipe_blocklist_filter",
    "agg_boolean_family", "win_running_distinct", "tpch_q20_part_surplus",
    "join_interval_overlap", "agg_mode_pergroup", "agg_corr_powersum",
    "pipe_length_histogram", "fn_url_parse", "win_zscore_outlier",
    "join_spatial_grid", "text_ttr", "agg_skew_kurtosis",
]


def _ordered_keys() -> list[str]:
    rest = [k for k in engine.REGISTRY if k not in _GRADE_FIRST]
    known = [k for k in _GRADE_FIRST if k in engine.REGISTRY]
    return known + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: engine.REGISTRY[key].fn for key in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per key; omitted keys → rows-only check."""
    return {
        key: engine.REGISTRY[key].oracle
        for key in _ordered_keys()
        if engine.REGISTRY[key].oracle is not None
    }
