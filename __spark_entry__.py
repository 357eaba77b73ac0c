"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``random_forest_using_hadoop_spark``
package; this module is a thin adapter over its registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

import random_forest_using_hadoop_spark as engine

engine.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2 B19, TPC-H-Q1-shape pricing summary)
    on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return engine.REGISTRY["agg_hash_groupby"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in engine.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per key; omitted keys → rows-only check."""
    return {
        key: spec.oracle
        for key, spec in engine.REGISTRY.items()
        if spec.oracle is not None
    }
