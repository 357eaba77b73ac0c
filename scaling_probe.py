"""Empirical scale-behavior probe (NOT a driver contract — bench.py is).

Runs the heavy/headline operators at sf0.001 → sf0.01 → sf0.1 and
reports, per key, the wall-time growth across each 10× data step. The
point is to replace "this plan should scale" docstring claims with a
measured number: an operator whose cost is ~linear in data shows a
10×-step ratio ≲ 10 (usually well under, because per-query fixed cost —
planning, codegen, task launch on 32 threads — doesn't grow with data);
an accidentally quadratic candidate-pair stage shows ratios racing past
10 and would be DOA at 100 TB.

Two ratios are reported for the 0.01→0.1 step:

- ``raw``  = t(0.1) / t(0.01) — what a reader reproduces directly;
- ``adj``  = (t(0.1) − t(0.001)) / max(t(0.01) − t(0.001), 0.02) —
  the same step with the per-query fixed floor subtracted, using
  t(0.001) as the floor estimate (at sf0.001 every table is ≤ ~600
  rows, so data cost is ≈ 0 and wall time IS the fixed cost). ``adj``
  is the better exponent estimate; it is clamped-noisy when
  t(0.01) ≈ floor (tiny numerator/denominator), so read it together
  with the raw times. alpha = log10(adj) is the fitted scaling
  exponent for the decade (1.0 = linear).

Protocol matches bench.py: per SF, one untimed warm pass per key, then
min-of-``--repeat`` timed runs with the same memo-clearing rules
(bench.clear_ml_cache), CC timed as the pipeline increment after
dedup_minhash. Results go to stderr as a markdown table and stdout as
one JSON line; COVERAGE.md records the committed table.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.session import get_spark

import bench

# bench.HEADLINE (already ordered so CC follows dedup_minhash and keeps
# the shared pair memo) plus the operators whose *shape* carries
# superlinear risk and therefore most needs a measured number:
# candidate-pair dedups, iterative graph ops, and the self-join text
# statistics. dedup_substring is the documented Σdf² truth-set baseline
# — measured here precisely so the winnowed sibling's contrast is a
# number, not an assertion.
EXTRA = [
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_substring",
    "dedup_embedding",
    "sim_query_topk",
    "graph_pagerank",
    "graph_triangle_count",
    "text_pmi_collocations",
    # second sweep (r9): the remaining self-join / blocked-candidate /
    # iterative shapes not covered above
    "join_fuzzy_levenshtein",
    "dedup_incremental",
    "dedup_lsh_audit",
    "graph_bfs_hops",
    "agg_user_path_patterns",
    "agg_basket_pairs",
    "join_interval_overlap",
    "join_spatial_grid",
    "agg_sliding_distinct",
    "pipe_contamination_ngram",
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2,
                    help="timed runs per (key, sf); reported value is the min")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="override the probed key set")
    ap.add_argument("--all", action="store_true",
                    help="probe EVERY registered key (full-registry scan)")
    ap.add_argument("--sfs", default=None,
                    help="comma list of scale factors, e.g. 0.01,0.1")
    opts = ap.parse_args()

    engine.load_all()
    if opts.all:
        keys = list(engine.REGISTRY)
    else:
        keys = opts.keys or [k for k in bench.HEADLINE + bench.EXTENDED
                             + EXTRA if k in engine.REGISTRY]
    sf_dirs = SF_DIRS
    if opts.sfs:
        sf_dirs = [f"/root/testdata/sf{s}" for s in opts.sfs.split(",")]
    spark = get_spark("rf_engine_scaling_probe")

    times: dict[str, dict[str, float]] = {k: {} for k in keys}
    for sf_dir in sf_dirs:
        sf = sf_dir.rsplit("sf", 1)[-1]
        for key in keys:  # untimed warm pass (JIT/codegen, like bench)
            bench.clear_ml_cache(spark, key)
            engine.REGISTRY[key].fn(spark, sf_dir).collect()
        for key in keys:
            samples = []
            for _ in range(max(1, opts.repeat)):
                bench.clear_ml_cache(spark, key)
                t0 = time.perf_counter()
                engine.REGISTRY[key].fn(spark, sf_dir).collect()
                samples.append(time.perf_counter() - t0)
            times[key][sf] = round(min(samples), 4)
            print(f"  probe {key} sf{sf}: {times[key][sf]:.3f}s",
                  file=sys.stderr, flush=True)

    rows = []
    for key in keys:
        t1 = times[key].get("0.01")
        t2 = times[key].get("0.1")
        raw = (t2 / max(t1, 1e-9)
               if (t1 is not None and t2 is not None) else float("nan"))
        row = {"key": key, "t_sf0.01": t1, "t_sf0.1": t2,
               "raw_10x": round(raw, 2) if raw == raw else None}
        t0 = times[key].get("0.001")
        if t0 is not None and t1 is not None and t2 is not None:
            adj = (t2 - t0) / max(t1 - t0, 0.02)
            alpha = math.log10(adj) if adj > 0 else float("nan")
            row.update({"t_sf0.001": t0, "adj_10x": round(adj, 2),
                        "alpha": round(alpha, 2)})
        rows.append(row)

    rows.sort(
        key=lambda r: -(r["raw_10x"] if r["raw_10x"] is not None else 0.0)
    )
    print("\n| key | sf0.01 | sf0.1 | raw 10× |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    def _fmt(v):  # a --sfs subset leaves some cells None
        return f"{v:.2f}" if isinstance(v, float) else "-"

    for r in rows:
        print(f"| {r['key']} | {_fmt(r['t_sf0.01'])} | {_fmt(r['t_sf0.1'])} "
              f"| {_fmt(r['raw_10x'])} |", file=sys.stderr)

    print(json.dumps({"metric": "scaling_10x_step", "unit": "ratio",
                      "repeat": max(1, opts.repeat), "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
