"""Cross-SF execution smoke (SURVEY.md §5.3.5, targeted form).

Oracle parity runs at the graded sf0.01; these tests execute the
SF-SENSITIVE keys at the other two scales — the ones whose guards or
thresholds depend on data shape (short-document n-gram guards, planted
duplicate structure, count thresholds, timestamp coverage) — asserting
they run and keep a stable schema. A key that is correct at sf0.01 but
throws at another SF is exactly the class of bug the r2 ADVICE found
latent in the sequence(1, 0) guards.
"""

from __future__ import annotations

import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import BENCH_SF_DIR, SMOKE_SF_DIR

engine.load_all()


# Keys whose behavior depends on corpus shape, not just size.
_SF_SENSITIVE = [
    "pipe_contamination_ngram",   # <4-token guard
    "pipe_repetition_score",      # <3-token guard
    "pipe_quality_composite",     # both guards + threshold bands
    "pipe_dedup_manifest",        # planted prefix-group structure
    "pipe_seq_packing",           # bucket/bin occupancy
    "dedup_simhash",              # band selectivity
    "dedup_ngram_jaccard",        # bin occupancy
    "tpch_q22_dormant_customers", # dormancy predicate vacuity (r2 ADVICE)
    "agg_heavy_hitters",          # count threshold vs per-user volume
    "win_gaps_islands",           # run-length structure
    "join_fuzzy_levenshtein",     # block sizes
    "scan_events_nanos",          # nanos rebuild at every file size
]


@pytest.mark.parametrize("key", _SF_SENSITIVE)
def test_runs_at_sf0001(key, spark):
    df = engine.REGISTRY[key].fn(spark, SMOKE_SF_DIR)
    assert df.columns
    df.count()  # full execution — guards must hold, not just analysis


@pytest.mark.parametrize(
    "key",
    # the cheap subset at bench SF (heavy dedup/CC keys are exercised at
    # sf0.1 by bench + the sf0.1 plan gates instead)
    [
        "pipe_contamination_ngram",
        "pipe_quality_composite",
        "tpch_q22_dormant_customers",
        "agg_heavy_hitters",
        "scan_events_nanos",
    ],
)
def test_runs_at_bench_sf(key, spark):
    df = engine.REGISTRY[key].fn(spark, BENCH_SF_DIR)
    assert df.columns
    df.count()
