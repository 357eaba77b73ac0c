"""Shared fixtures: one SparkSession + one DuckDB connection per test
session, plus a comparator that clones the driver's t2 check
(row-count + column names + order-insensitive value comparison with
columns sorted by name)."""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from random_forest_using_hadoop_spark.session import get_spark

    s = get_spark("rf_engine_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    """Canonicalize one cell so Spark and DuckDB values compare equal."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        # A stringifying driver hash sees Decimal('123.450000') ≠ 123.45,
        # so a DECIMAL column may never stand in for a DOUBLE one — tag
        # decimals by their exact string form, distinct from floats.
        return ("dec", str(v))
    if isinstance(v, float):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # Tag floats so int-typed 0 never equals float-typed 0.0 and
        # -0.0 differs from 0.0 — a stringifying driver hash would see
        # those as different, so our local gate must too.
        return ("f", repr(f))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def assert_parity(spark_df, oracle: str, duck) -> None:
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    rel = duck.execute(oracle)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    )
    s_norm = normalize(scols, srows)
    o_norm = normalize(ocols, orows)
    if s_norm != o_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, o_norm) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({len(diffs)}+ rows differ); first diffs:\n"
            + "\n".join(f"  spark={a}\n oracle={b}" for a, b in diffs)
        )
