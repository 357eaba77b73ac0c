"""Delta-protocol layer unit tests (r10).

The four Delta keys are oracle-graded on CONTENT (per-version rows and
cent totals); these tests pin the MECHANISM — staged commit layout,
dataChange flags, and remove-honoring live-set replay — directly
against the shared staging helpers, so a regression that happens to
preserve totals on the fixture (e.g. compaction marked dataChange:true,
or a replay that unions adds without removes on a corpus where v0 is
empty) still fails.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from random_forest_using_hadoop_spark.operators.scans import (
    _delta_stage_history,
    _tmp,
)
from random_forest_using_hadoop_spark.sources import load_table
from tests.conftest import SF_DIR


def _stage(spark):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = _tmp(SF_DIR, "delta_unit")
    return root, _delta_stage_history(spark, o, root)


def test_staged_commit_layout_and_datachange_flags(spark):
    root, (v0, v1, v2) = _stage(spark)
    log_dir = os.path.join(root, "_delta_log")
    names = sorted(os.listdir(log_dir))
    assert names == [f"{v:020d}.json" for v in range(3)]
    actions = {}
    for v, name in enumerate(names):
        with open(os.path.join(log_dir, name)) as fh:
            actions[v] = [json.loads(ln) for ln in fh if ln.strip()]
    # v0/v1: append commits — adds only, dataChange true
    for v, adds in ((0, v0), (1, v1)):
        got = [a["add"] for a in actions[v] if "add" in a]
        assert {g["path"] for g in got} == {f"data/{p}" for p in adds}
        assert all(g["dataChange"] is True for g in got)
        assert not [a for a in actions[v] if "remove" in a]
    # v2: compaction — rearrangement only, dataChange FALSE on BOTH
    # action kinds (the protocol signal stream_delta_commits relies on)
    got_add = [a["add"] for a in actions[2] if "add" in a]
    got_rm = [a["remove"] for a in actions[2] if "remove" in a]
    assert {g["path"] for g in got_add} == {f"data/{p}" for p in v2}
    assert {g["path"] for g in got_rm} == {f"data/{p}" for p in v0}
    assert all(g["dataChange"] is False for g in got_add + got_rm)


def test_log_replay_live_sets_honor_removes(spark):
    """Replay with the same plan shape the readers use (explode version
    projection + max_by(is_add, u)) and assert the per-version live
    FILE SETS — v2 must drop every v0 file even though its content
    equals v1's, which the value oracles alone cannot distinguish from
    an adds-only union when v0 is empty on a degenerate corpus."""
    root, (v0, v1, v2) = _stage(spark)
    log_schema = T.StructType(
        [
            T.StructField(
                "add", T.StructType([T.StructField("path", T.StringType())])
            ),
            T.StructField(
                "remove",
                T.StructType([T.StructField("path", T.StringType())]),
            ),
        ]
    )
    live = (
        spark.read.schema(log_schema)
        .json(os.path.join(root, "_delta_log", "*.json"))
        .withColumn(
            "u",
            F.regexp_extract(F.input_file_name(), r"(\d+)\.json", 1).cast(
                "int"
            ),
        )
        .select(
            "u",
            F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
            F.col("add.path").isNotNull().alias("is_add"),
        )
        .filter(F.col("path").isNotNull())
        .select(
            "path",
            "is_add",
            "u",
            F.explode(F.sequence("u", F.lit(2))).alias("version"),
        )
        .groupBy("version", "path")
        .agg(F.max_by("is_add", "u").alias("live"))
        .filter("live")
        .collect()
    )
    by_v: dict[int, set] = {}
    for r in live:
        by_v.setdefault(r["version"], set()).add(r["path"].split("/")[-1])
    assert by_v.get(0, set()) == v0
    assert by_v.get(1, set()) == v0 | v1
    assert by_v.get(2, set()) == v1 | v2, "v2 must drop all v0 files"
    assert not (by_v.get(2, set()) & v0), "removed files leaked into v2"
