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


# Grading priority (round 8): the driver grades the FIRST 50 keys in
# dict order. Cumulative r1∪…∪r7 evidence: 289/289 keys green (every
# key green as of its latest grading) — r7 closed the zero-evidence
# gap, so this round executes the staleness rotation the r7 comment
# planned: new-in-r8 keys first (no new key waits a round for
# evidence), then ALL 39 r1-era keys (their rows date from the r1
# engine, the repo's oldest evidence) — with 11 new-in-r8 keys the
# 50-key window cut falls EXACTLY at the end of the r1 block, so the
# r3/r4-graded tail starts at position 51 and none of it is graded
# this round. The keys graded in r7 (new-r7 + late-r5) are the
# freshest and go last. r9 plan: new keys first, then the ENTIRE
# r3/r4-graded tail (starting at fn_try_safe — none re-graded in r8),
# then the r5/r6-graded blocks. Every key appears at most
# once; unlisted keys append in registration order.
_GRADE_FIRST = [
    # --- new-in-r8 keys: inserted here, position 1, as they land ---
    "dedup_substring_winnow", "dedup_canonical_keep",
    "dedup_threshold_sweep", "dedup_chunk_exact",
    "pipe_expectation_suite", "sink_mv_delta_maintenance",
    "agg_table_checksum", "ml_calibration_bins",
    "agg_join_skew_diagnostics", "pipe_dedup_stage_funnel",
    "agg_data_freshness_sla",
    # (11 new keys — the cap that keeps all 39 r1-era keys below
    # inside the 50-key window)
    # --- r1-era keys (stalest driver evidence), re-graded under the
    # current engine (39 keys) ---
    "scan_parquet", "filter_basic", "project_expr", "limit_topk",
    "sort_multikey", "distinct_rows", "set_union_all",
    "agg_hash_groupby", "join_multiway", "topk_per_group",
    "join_broadcast", "join_sortmerge", "join_outer",
    "agg_grouping_sets", "join_bucketed_colocated", "agg_stats",
    "win_rank", "scan_prune_pushdown", "sink_parquet_part",
    "join_semi", "join_anti",
    "join_cross", "agg_rollup", "agg_cube",
    "win_moving_rows", "win_range_frame", "win_analytic",
    "scan_schema_evolution", "src_csv_json",
    "sink_range_cluster", "sink_upsert",
    "agg_global", "agg_distinct", "agg_filtered",
    "filter_like_regex", "filter_null_safe",
    "set_union", "set_intersect", "set_except",
    # --- then the r3/r4-graded tail (fully OUTSIDE the r8 window;
    #     first in line for the r9 rotation) ---
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
    # --- freshest evidence (graded green in r7), so last in line ---
    "agg_winsorized_mean", "agg_ols_multi", "agg_kaplan_meier",
    "win_ewma_crossover", "ml_pr_curve", "pipe_bpe_pair_stats",
    "sim_centroid_assign", "win_vwap_cumulative",
    "dedup_rate_by_source", "text_zipf_slope",
    "agg_new_vs_returning", "agg_interorder_gaps",
    "sql_cte_pipeline", "sink_json_gzip", "multimodal_resize",
    "graph_bfs_hops", "agg_abc_classification", "scan_csv_quoted_multiline",
    "pipe_span_corruption", "text_keyword_tfidf_topk",
    "src_xml", "agg_hll_portable", "agg_countmin_heavy",
    "agg_bloom_membership", "agg_kmv_theta_setops", "agg_welch_ttest",
    "agg_mannwhitney_u", "agg_ks_test", "agg_spearman_corr",
    "agg_srm_guard", "agg_log2_histogram", "agg_percentile_histogram",
    "agg_user_path_patterns", "fn_ipv4_subnet", "join_asof_tolerance",
    "ml_auc_exact", "ml_decile_lift", "multimodal_audio_codec",
    "pipe_epoch_shuffle", "pipe_url_canonical_dedup",
    "pipe_vocab_coverage", "scan_agg_pushdown",
    "scan_missing_file_resilient", "sink_dictionary_encode",
    "sink_incremental_diff", "win_bollinger_bands",
    "win_gap_fill_interpolate", "win_ohlc_candles", "win_rsi_indicator",
    "win_sliding_median",
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
