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


def test_grade_order_is_oldest_evidence_first():
    """r8-verdict task 1: the grading order must be a non-decreasing
    sweep of latest-driver-grade (never-graded keys treated as oldest),
    after the manual-pin prefix. This makes the 50-key window always
    hold the stalest evidence in the repo — the r8 window missed the
    true stalest block because the hand-maintained list drifted."""
    latest = entrymod._latest_grade()
    if not latest:  # fresh clone without driver artifacts
        return
    ordered = entrymod._ordered_keys()
    tail = ordered[len([k for k in entrymod._GRADE_FIRST
                        if k in engine.REGISTRY]):]
    grades = [latest.get(k, -1) for k in tail]
    assert grades == sorted(grades), (
        "grading order is not oldest-evidence-first: first inversion at "
        f"{next((tail[i], tail[i + 1]) for i in range(len(grades) - 1) if grades[i] > grades[i + 1])}"
    )


def test_grade_window_holds_zero_evidence_keys_first():
    """New keys (no CORRECTNESS evidence yet) must lead the 50-key
    grading window — a consequence of oldest-evidence-first, kept as an
    explicit tripwire for the never-graded class."""
    latest = entrymod._latest_grade()
    if not latest:  # fresh clone without driver artifacts
        return
    window = entrymod._ordered_keys()[:50]
    never = [k for k in engine.REGISTRY if k not in latest]
    overflow = [k for k in never if k not in window]
    assert len(never) > 50 or overflow == [], (
        f"zero-evidence keys outside the 50-key grading window: {overflow}"
    )
