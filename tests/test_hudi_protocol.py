"""Hudi COW timeline/file-slice mechanism pins (operators/hudi.py).

The two Hudi keys are oracle-graded on content; these tests pin the
MECHANISM — completed-instant filtering, file-slice resolution, and
incomplete-write invisibility — directly against the staged fixture,
so a regression that happens to preserve totals (e.g. a resolver that
prefers newest file regardless of timeline state on a fixture where
the poison slice were missing) still fails.
"""

from __future__ import annotations

import os

import pytest

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.operators.hudi import (
    _hudi_base_files,
    _hudi_completed_commits,
    _hudi_snapshot_files,
    _hudi_stage,
)
from tests.conftest import SF_DIR

engine.load_all()


@pytest.fixture(scope="module")
def staged(spark):
    return _hudi_stage(spark, SF_DIR)


def test_timeline_excludes_incomplete_instants(staged):
    root, prios, (c1, c2, c3) = staged
    assert _hudi_completed_commits(root) == [c1, c2]
    # c3 wrote its data file and both pre-commit markers — a listing
    # sees 7 base files, the timeline admits only 6
    assert len(_hudi_base_files(root)) == len(prios) + 2
    assert os.path.exists(os.path.join(root, ".hoodie", f"{c3}.inflight"))
    assert not os.path.exists(os.path.join(root, ".hoodie", f"{c3}.commit"))


def test_snapshot_picks_latest_completed_slice_per_group(staged):
    root, prios, (c1, c2, c3) = staged
    latest = _hudi_snapshot_files(root)
    assert len(latest) == len(prios)
    urgent = [f for f in latest if "fg-1-URGENT" in f]
    assert len(urgent) == 1 and f"_{c2}.parquet" in urgent[0]
    assert not any(f"_{c3}.parquet" in f for f in latest)
    # time travel to c1: every group at its first slice
    asof = _hudi_snapshot_files(root, as_of=c1)
    assert len(asof) == len(prios)
    assert all(f"_{c1}.parquet" in f for f in asof)


def test_empty_timeline_refuses(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, ".hoodie"))
    with pytest.raises(ValueError, match="no completed commits"):
        _hudi_snapshot_files(root)


def test_incremental_range_is_slice_bounded(staged):
    root, prios, (c1, c2, c3) = staged
    completed = set(_hudi_completed_commits(root))
    in_range = [
        bf
        for bf in _hudi_base_files(root)
        if c1 < bf["instant"] <= c2 and bf["instant"] in completed
    ]
    # exactly the one slice c2 rewrote — never O(table)
    assert [bf["file_id"] for bf in in_range] == ["fg-1-URGENT"]
