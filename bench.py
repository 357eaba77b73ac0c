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
the signal; the raw per-run samples go to STDERR ({"runs": ...}) so a
reader can see the noise band while the driver's bounded stdout tail
still holds every headline key.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.session import get_spark

# Headline set mirrors BASELINE.md's workloads; any registered key may be
# added. Keys not yet in the registry are skipped silently so bench.py
# stays runnable mid-build.
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
    # r11 additions — the Delta-protocol reader layer (r10's new
    # surface; its keys re-stage their commit history every run, so the
    # timing covers staging + log replay + audit — the number is
    # staging-dominated, which the scaling probe measured flat across
    # the sf decade: 0.88×/0.98×/1.21× per 10× step):
    "src_delta_log",
    "src_delta_checkpoint",
    "src_delta_partition_prune",
    "stream_delta_commits",
    # r11 additions — the protocol-generality keys (column mapping,
    # stats skipping, deletion vectors, change data feed, replaceWhere
    # overwrite), anchored in the same session so their 2× criterion is
    # decidable from day one rather than a round later:
    "src_delta_column_mapping",
    "src_delta_stats_skipping",
    "src_delta_deletion_vector",
    "src_delta_cdf",
    "sink_delta_replacewhere",
    # r11 second wave — txn idempotence, timestamp time travel, and the
    # VARIANT round-trip, anchored in the same session as the above:
    "sink_delta_txn_idempotent",
    "src_delta_time_travel_ts",
    "fn_variant_shred",
    "src_delta_checkpoint_v2",
    "sink_delta_vacuum",
    # r12 additions — the Iceberg v2 reader layer (manifest-list →
    # manifest → pruned scan through the from-scratch Avro codec) and
    # the timestampNtz reader feature; like the delta keys these
    # re-stage their table every run, so the numbers are
    # staging-dominated (scaling probe: 1.07–1.53× per 10× step):
    "src_iceberg_snapshot",
    "src_iceberg_time_travel",
    "src_iceberg_partition_prune",
    "src_delta_timestamp_ntz",
    # r12 second wave — Iceberg row-level position deletes and
    # field-id/name-mapping schema evolution:
    "src_iceberg_pos_delete",
    "src_iceberg_schema_evolution",
    # r12 third wave — manifest value-bounds file skipping and the
    # equality-delete (CDC upsert) shape:
    "src_iceberg_stats_prune",
    "src_iceberg_eq_delete",
    # r12 maintenance pair — snapshot expiry (storage reclaim) and
    # small-file compaction (REPLACE snapshot):
    "sink_iceberg_expire_snapshots",
    "sink_iceberg_compact",
    # r12 — the typeWidening reader feature (int->long in-scan widening):
    "src_delta_type_widening",
    # r12 — bucket-transform point lookups and incremental append scans:
    "src_iceberg_bucket_transform",
    "src_iceberg_incremental",
    # r12 — the variantType reader feature (binary VARIANT through a
    # staged Delta table):
    "src_delta_variant_type",
    # r12 — temporal transform pruning and the streaming commit tail:
    "src_iceberg_year_transform",
    "stream_iceberg_commits",
    # r13 — partition-spec evolution, the v3 trio (Puffin deletion
    # vectors, row lineage, default values), and liquid clustering:
    "src_iceberg_spec_evolution",
    "src_iceberg_v3_dv",
    "src_iceberg_v3_row_lineage",
    "src_iceberg_v3_default_values",
    "src_delta_liquid_clustering",
    # r13 second wave — Delta row tracking (the protocol twin of v3
    # row lineage) and conjunctive multi-field spec pruning:
    "src_delta_row_tracking",
    "src_iceberg_multifield_spec",
    # r13 third wave — snapshot refs (tags/WAP branches) and the
    # UniForm-style dual-format read:
    "src_iceberg_refs",
    "src_lake_uniform",
    # r13 fourth wave — the two metadata-cost tiers: manifest-level
    # summary pruning and log-compaction bootstrap:
    "src_iceberg_manifest_prune",
    "src_delta_log_compaction",
    # r13 fifth wave — the inspection surface and metadata-only restore:
    "src_iceberg_meta_files",
    "sink_iceberg_rollback",
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
    spark = get_spark("rf_engine_bench")

    active = [k for k in HEADLINE if k in engine.REGISTRY]
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
    # stdout: ONE COMPACT line — per-key minima only. The driver
    # records a bounded tail of stdout, and the full per-run arrays
    # once pushed the first headline keys out of the committed record
    # (BENCH_r12.json "tail" truncation); the noise band goes to
    # stderr for humans instead.
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "repeat": max(1, opts.repeat),
                "sf": sf,
            }
        )
    )
    print(json.dumps({"runs": runs}), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
