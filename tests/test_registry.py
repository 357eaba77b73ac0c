"""Tripwires for the driver-grading machinery itself.

The `_GRADE_FIRST` rotation in `__spark_entry__.py` is the mechanism by
which registry keys earn driver CORRECTNESS evidence (the driver grades
the first 50 keys of `queries()` each round). A typo in the rotation
would silently un-grade a key, so these are hard gates:

- every `_GRADE_FIRST` entry resolves to a registered key;
- no duplicates;
- every registry key appears exactly once in `_ordered_keys()`;
- every registered key has an oracle (the repo's standing guarantee —
  the driver's weaker rows-only check is intentionally unused);
- `queries()` / `oracle_sql()` stay column-name-aligned by construction
  (both read the same registry entry).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
import random_forest_using_hadoop_spark as engine

engine.load_all()


def test_grade_first_subset_of_registry():
    missing = [k for k in entrymod._GRADE_FIRST if k not in engine.REGISTRY]
    assert missing == [], f"_GRADE_FIRST names unknown keys: {missing}"


def test_grade_first_no_duplicates():
    seen: set[str] = set()
    dupes = [k for k in entrymod._GRADE_FIRST if k in seen or seen.add(k)]
    assert dupes == [], f"duplicate _GRADE_FIRST entries: {dupes}"


def test_ordered_keys_is_exact_registry_permutation():
    ordered = entrymod._ordered_keys()
    assert len(ordered) == len(set(ordered)), "duplicate key in ordering"
    assert set(ordered) == set(engine.REGISTRY), (
        "ordering and registry diverge: "
        f"only-in-ordering={set(ordered) - set(engine.REGISTRY)} "
        f"only-in-registry={set(engine.REGISTRY) - set(ordered)}"
    )


def test_queries_and_oracles_cover_registry():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(q) == set(engine.REGISTRY)
    # standing guarantee: every key carries a SQL oracle (no rows-only
    # fallback keys), so a regression here weakens the correctness gate
    assert set(o) == set(engine.REGISTRY), (
        f"keys without oracle: {set(q) - set(o)}"
    )


def test_grade_window_holds_zero_evidence_keys_first():
    """The first 50 keys (the driver's grading window) must contain every
    key that has never appeared in a CORRECTNESS_r*.json — new keys must
    not linger ungraded behind already-graded ones."""
    import json

    repo = Path(__file__).resolve().parent.parent
    graded: set[str] = set()
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        graded.update(json.load(open(f)))
    if not graded:  # fresh clone without driver artifacts
        return
    window = entrymod._ordered_keys()[:50]
    never = [k for k in engine.REGISTRY if k not in graded]
    overflow = [k for k in never if k not in window]
    assert len(never) > 50 or overflow == [], (
        f"zero-evidence keys outside the 50-key grading window: {overflow}"
    )
