"""Tier A ML sanity (SURVEY.md §5.3.3): seeded determinism, accuracy
floor, confusion-marginal consistency, persistence roundtrip."""

from __future__ import annotations

import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


@pytest.fixture(scope="module")
def reg():
    return engine.REGISTRY


def test_assemble_dims(spark, reg):
    rows = reg["ml_assemble"].fn(spark, SF_DIR).collect()
    assert all(r.n_features == 64 for r in rows)


def test_split_partitions_everything(spark, reg):
    rows = reg["ml_split"].fn(spark, SF_DIR).collect()
    total = sum(r.n for r in rows)
    n_all = reg["ml_assemble"].fn(spark, SF_DIR).count()
    assert total == n_all


def test_bootstrap_counts(spark, reg):
    row = reg["ml_bootstrap"].fn(spark, SF_DIR).collect()[0]
    # with-replacement at fraction 1.0: n≈N, distinct ≈ (1-1/e)N
    assert 0.85 <= row.n_sampled / 500 <= 1.15
    assert row.n_unique < row.n_sampled


def test_rf_train_summary(spark, reg):
    row = reg["ml_rf_train"].fn(spark, SF_DIR).collect()[0]
    assert row.num_trees == 20
    assert row.n_train + row.n_test == 500
    # labels are near-chance in this corpus (BASELINE: acc 0.115) — the
    # floor asserts "model votes sanely", not "model is good"
    assert 0.02 <= row.accuracy <= 1.0


def test_confusion_marginals_match_test_counts(spark, reg):
    conf = reg["ml_rf_predict"].fn(spark, SF_DIR).collect()
    eval_row = reg["ml_eval"].fn(spark, SF_DIR).collect()[0]
    assert sum(r.n for r in conf) == eval_row.n_test


def test_determinism_same_seed(spark, reg):
    a = sorted(map(tuple, reg["ml_rf_predict"].fn(spark, SF_DIR).collect()))
    engine.ml.forest._CACHE.clear()
    b = sorted(map(tuple, reg["ml_rf_predict"].fn(spark, SF_DIR).collect()))
    assert a == b


def test_persistence_roundtrip_identical(spark, reg):
    row = reg["ml_persist"].fn(spark, SF_DIR).collect()[0]
    assert row.n_mismatch == 0
    assert row.n_pred > 0


def test_importances_valid(spark, reg):
    rows = reg["ml_importance"].fn(spark, SF_DIR).collect()
    assert rows and all(0.0 <= r.importance <= 1.0 for r in rows)
