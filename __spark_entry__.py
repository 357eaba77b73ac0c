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


# Grading priority: the driver grades the FIRST 50 keys of
# ``queries()`` dict order each round. Since round 9 the rotation is
# DATA-DRIVEN (r8 verdict task 1): the window is computed from the
# committed CORRECTNESS_r*.json union — never-graded keys first (in
# registration order, so no new key waits a round for evidence), then
# all graded keys by oldest latest-grade first. With zero new keys the
# r9 window is exactly the 50 keys whose latest driver evidence is
# round 2 (streaming B50-B57, ML A1-A10, scalar fns B42-B49, UDFs
# B58-B61, and the core Tier-C dedup/sim/text/multimodal keys).
# ``_GRADE_FIRST`` survives only as a manual pin escape hatch (e.g. to
# force a regression re-grade ahead of the staleness order); it is
# empty in normal operation. r10: the r9 pins did their job (both
# rewrites driver-graded green in CORRECTNESS_r09.json), so the pins
# are emptied and the pure staleness order takes over — it now leads
# with the two keys the pins displaced from the r9 window
# (`stream_stateful`, `stream_foreachbatch`, the only keys whose
# latest driver evidence is still round 2), followed by the r3 block.
_GRADE_FIRST: list[str] = []


def _latest_grade() -> dict[str, int]:
    """Latest driver round that graded each key, from the committed
    CORRECTNESS_r*.json artifacts next to this file. Keys absent from
    every artifact (new this round) are simply missing from the map."""
    import json

    here = Path(__file__).resolve().parent
    latest: dict[str, int] = {}
    for f in sorted(here.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.rsplit("_r", 1)[1])
            data = json.loads(f.read_text())
        except (ValueError, IndexError, OSError):
            continue
        for key in data:
            latest[key] = max(rnd, latest.get(key, 0))
    return latest


def _ordered_keys() -> list[str]:
    """Registry permutation: manual pins, then never-graded keys (in
    registration order), then graded keys oldest-evidence-first (ties
    broken by registration order). The driver grades positions 1-50."""
    reg = list(engine.REGISTRY)
    pos = {k: i for i, k in enumerate(reg)}
    latest = _latest_grade()
    pinned = [k for k in _GRADE_FIRST if k in engine.REGISTRY]
    rest = [k for k in reg if k not in set(pinned)]
    rest.sort(key=lambda k: (latest.get(k, -1), pos[k]))
    return pinned + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: engine.REGISTRY[key].fn for key in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per key; omitted keys → rows-only check."""
    return {
        key: engine.REGISTRY[key].oracle
        for key in _ordered_keys()
        if engine.REGISTRY[key].oracle is not None
    }
