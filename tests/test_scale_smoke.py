"""Cross-SF execution smoke (SURVEY.md §5.3.5).

Oracle parity runs at the graded sf0.01; these tests execute EVERY
registry key at sf0.001 — the scale where short-document n-gram guards,
planted duplicate structure, count thresholds, and timestamp coverage
all degenerate — asserting each runs to completion with a stable
schema. A key that is correct at sf0.01 but throws at another SF is
exactly the class of bug the r2 ADVICE found latent in the
sequence(1, 0) guards; enumerating the whole registry catches that
class before the driver does. A curated SF-sensitive subset re-runs at
the 10× bench scale too.
"""

from __future__ import annotations

import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import BENCH_SF_DIR, SMOKE_SF_DIR

engine.load_all()


@pytest.mark.parametrize("key", sorted(engine.REGISTRY))
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
