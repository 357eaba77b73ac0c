"""Local clone of the driver's t2 gate: every registered SQL-oracle
query runs on Spark and DuckDB at sf0.01 and must match on column
names, row count, and (order-insensitive) values."""

from __future__ import annotations

import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import SF_DIR, assert_parity

engine.load_all()

SQL_KEYS = sorted(k for k, s in engine.REGISTRY.items() if s.oracle)
ROWS_ONLY_KEYS = sorted(k for k, s in engine.REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("key", SQL_KEYS)
def test_sql_oracle_parity(key, spark, duck):
    spec = engine.REGISTRY[key]
    assert_parity(spec.fn(spark, SF_DIR), spec.oracle, duck)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark):
    """Rows-only ops must at least execute and return a stable schema."""
    spec = engine.REGISTRY[key]
    df = spec.fn(spark, SF_DIR)
    assert df.columns
    df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_cache_hygiene_releases_everything(spark):
    """After the full parity sweep above, release_caches() must leave
    ZERO persistent RDDs — the long-lived caches the sweep accumulates
    (simhash `sh`, CC `edges`, ML split, iterative checkpoints) are all
    engine-owned and must all be releasable."""
    engine.release_caches(spark)
    n = engine.cached_block_count(spark)
    assert n == 0, f"{n} persistent RDDs survived release_caches()"
