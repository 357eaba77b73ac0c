"""Tier A ML sanity (SURVEY.md §5.3.3): seeded determinism, accuracy
floor, split/bootstrap invariants, persistence roundtrip.

r2: every Tier A query now RETURNS its invariants as a graded
projection (exact SQL-derivable columns + booleans), so most tests
assert the booleans came back true — the SQL-oracle parity test
separately proves the exact columns match DuckDB.
"""

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


def test_split_invariants(spark, reg):
    row = reg["ml_split"].fn(spark, SF_DIR).collect()[0]
    assert row.n_total == 500 and row.n_classes == 10
    assert row.split_exhaustive and row.train_frac_ok and row.all_classes_in_train


def test_bootstrap_invariants(spark, reg):
    row = reg["ml_bootstrap"].fn(spark, SF_DIR).collect()[0]
    assert row.n_rows == 500
    assert row.sampled_frac_ok and row.unique_frac_ok


def test_rf_train_summary(spark, reg):
    row = reg["ml_rf_train"].fn(spark, SF_DIR).collect()[0]
    assert row.num_trees == 20
    assert row.n_total == 500
    # labels are near-chance in this corpus (BASELINE: acc 0.115) — the
    # floor asserts "model votes sanely", not "model is good"
    assert row.forest_grew and row.acc_above_chance


def test_predict_and_eval_invariants(spark, reg):
    pred = reg["ml_rf_predict"].fn(spark, SF_DIR).collect()[0]
    assert pred.n_classes == 10
    assert pred.preds_in_domain and pred.votes_cover_test and pred.preds_integral
    ev = reg["ml_eval"].fn(spark, SF_DIR).collect()[0]
    assert ev.acc_in_01 and ev.f1_in_01 and ev.acc_above_chance


def test_regression_invariants(spark, reg):
    row = reg["ml_rf_reg"].fn(spark, SF_DIR).collect()[0]
    assert row.n_test_pos and row.rmse_finite and row.rmse_bounded


def test_determinism_same_seed(spark, reg):
    a = sorted(map(tuple, reg["ml_rf_predict"].fn(spark, SF_DIR).collect()))
    engine.ml.forest._CACHE.clear()
    b = sorted(map(tuple, reg["ml_rf_predict"].fn(spark, SF_DIR).collect()))
    assert a == b


def test_persistence_roundtrip_identical(spark, reg):
    row = reg["ml_persist"].fn(spark, SF_DIR).collect()[0]
    assert row.n_mismatch == 0
    assert row.roundtrip_nonempty


def test_importances_valid(spark, reg):
    row = reg["ml_importance"].fn(spark, SF_DIR).collect()[0]
    assert row.n_top == 10
    assert row.all_in_01 and row.total_le_1 and row.sorted_desc and row.idx_in_range
