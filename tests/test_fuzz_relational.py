"""Adversarial micro-warehouse parity (r8) — relational sibling of
test_fuzz_parity.py.

A deterministic, 40-ish-row TPC-H-shaped warehouse built from edge
shapes the generated fixture is too regular to produce: a region with
no nations, a customer with no orders, an order with no lineitems, a
part and a supplier no lineitem references, boundary quantities (1 and
50), zero and maximum discounts, the exact MV cutoff timestamp, a
0.01 total price, and negative account balances. Every SQL-graded
relational key that doesn't need the events table is re-graded against
its own oracle on this warehouse through the driver's canonicalization
path — the degenerate-group / empty-join / zero-denominator edges that
seven rounds of regular-fixture grading cannot reach.
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import assert_parity

# Heaviest suite tier: deselect with -m "not battery" for a fast dev
# loop; CI and round-close always run the full suite (pytest.ini).
pytestmark = pytest.mark.battery

engine.load_all()

_WH = "/tmp/rf_engine_fuzz_warehouse"

_TS = datetime  # brevity


_WH_FINGERPRINT = "r9a"  # bump on any _build data change: the marker
# below is keyed on it so edits rebuild instead of silently grading
# stale parquet


def _build(spark) -> str:
    marker = os.path.join(_WH, f"_built_{_WH_FINGERPRINT}")
    if os.path.exists(marker):
        return _WH

    def w(name: str, rows, schema: str):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(_WH, f"{name}.parquet"))

    w("region", [(0, "EUROPE"), (1, "ASIA"), (2, "AFRICA")],
      "r_regionkey int, r_name string")  # AFRICA: no nations
    w("nation",
      [(0, "NATION_0", 0), (1, "NATION_1", 0), (2, "NATION_2", 1),
       (3, "NATION_3", 1)],
      "n_nationkey int, n_name string, n_regionkey int")
    w("customer",
      [(1, "Customer#1", 0, 1234.56, "BUILDING"),
       (2, "Customer#2", 1, -99.99, "AUTOMOBILE"),
       (3, "Customer#3", 2, 0.0, "MACHINERY"),
       (4, "Customer#4", 3, 500.0, "BUILDING"),
       (5, "Customer#5", 0, 10000.0, "HOUSEHOLD"),
       (6, "Customer#6", 1, 42.42, "FURNITURE")],  # 6: no orders
      "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
      " c_mktsegment string")
    w("supplier",
      [(1, "Supplier#1", 0, 100.0), (2, "Supplier#2", 1, -5.0),
       (3, "Supplier#3", 2, 9999.0), (4, "Supplier#4", 3, 0.0)],
      "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    w("part",
      [(1, "part one", "Brand#1", "PROMO", 1, 901.0),
       (2, "part two", "Brand#5", "STANDARD", 4, 100.5),
       (3, "part three", "Brand#9", "ECONOMY", 9, 55.25),
       (4, "part four", "Brand#13", "PROMO", 49, 12.0),
       (5, "part five", "Brand#5", "LARGE", 50, 77777.77),
       (6, "part six", "Brand#1", "SMALL", 36, 1.01)],  # 6: never sold
      "p_partkey long, p_name string, p_brand string, p_type string,"
      " p_size int, p_retailprice double")
    w("orders",
      [(100, 1, "O", 1000.0, _TS(1995, 3, 1), "1-URGENT"),
       (101, 1, "F", 0.01, _TS(1996, 6, 15), "5-LOW"),
       (102, 1, "P", 250000.0, _TS(1997, 1, 1), "2-HIGH"),
       (103, 2, "O", 321.99, _TS(1998, 12, 31), "3-MEDIUM"),
       (104, 3, "F", 45678.12, _TS(2000, 7, 4), "4-NOT SPECIFIED"),
       (105, 4, "O", 88.88, _TS(2001, 1, 1), "1-URGENT"),  # MV cutoff
       (106, 5, "F", 104997.88, _TS(2001, 11, 4), "2-HIGH"),
       (107, 5, "O", 5.0, _TS(1995, 1, 2), "5-LOW")],  # no lineitems
      "o_orderkey long, o_custkey long, o_orderstatus string,"
      " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    w("lineitem",
      [(100, 1, 1, 1, 1.0, 901.82, 0.0, 0.0, "A", "F", _TS(1995, 1, 2)),
       (100, 2, 2, 2, 50.0, 104997.88, 0.1, 0.08, "N", "O", _TS(1995, 4, 1)),
       (100, 3, 1, 3, 25.0, 5000.0, 0.05, 0.02, "R", "F", _TS(1995, 5, 9)),
       (101, 1, 3, 1, 2.0, 1803.64, 0.1, 0.0, "A", "F", _TS(1996, 7, 1)),
       (102, 4, 4, 1, 49.0, 588.0, 0.0, 0.08, "N", "O", _TS(1997, 2, 2)),
       (102, 4, 1, 2, 50.0, 600.0, 0.02, 0.01, "N", "O", _TS(1997, 2, 3)),
       (103, 5, 2, 1, 10.0, 77777.7, 0.07, 0.04, "R", "F", _TS(1999, 1, 15)),
       (104, 2, 2, 1, 30.0, 63000.0, 0.04, 0.06, "A", "F", _TS(2000, 8, 1)),
       (104, 3, 3, 2, 3.0, 165.75, 0.0, 0.0, "N", "F", _TS(2000, 8, 2)),
       (105, 1, 1, 1, 1.0, 901.82, 0.1, 0.08, "R", "O", _TS(2001, 1, 1)),
       (106, 5, 4, 1, 47.0, 103654.9, 0.06, 0.03, "N", "O", _TS(2001, 11, 4)),
       (106, 2, 2, 2, 8.0, 804.0, 0.0, 0.05, "A", "F", _TS(2001, 11, 4))],
      "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
      " l_quantity double, l_extendedprice double, l_discount double,"
      " l_tax double, l_returnflag string, l_linestatus string,"
      " l_shipdate timestamp")
    w("documents",
      [(0, "tiny fuzz document one", "en", "src0", 22),
       (1, "tiny fuzz document two", "de", "src1", 22)],
      "doc_id long, text string, lang string, source string, n_chars long")
    # 64-dim like the real fixture: the UDF surface's query vector is
    # fixture-dimension-bound by contract (udfs._QUERY_DIM), and prices
    # stay within the documented ~1e5 fixed-point envelope — the
    # battery probes edge SHAPES inside the documented domain, not
    # out-of-domain magnitudes
    # 200 learnable rows: vectors cluster by label (dimension blocks
    # keyed by label), so the ML audit claims (accuracy above chance,
    # RMSE below label stddev) hold on the micro fixture the way they
    # hold on the real one; the deterministic wiggle keeps every
    # vector distinct for the similarity keys
    w("embeddings",
      [(i,
        [(1.5 if d % 3 == i % 3 else -0.5)
         + ((i * 37 + d * 11) % 97) / 970.0
         for d in range(64)],
        i % 3)
       for i in range(200)],
      "vec_id long, embedding array<float>, label int")
    # events: adversarial micro-stream. Written as plain microsecond
    # timestamps (DuckDB/Spark both read them natively; load_table's
    # nanos rebuild only engages on BIGINT-typed ts, so a us file rides
    # through untouched — the nanos INGEST path itself is covered by
    # the real fixture). Shapes: EVERY user converts inside the KM
    # horizon (the d == n_risk terminal day the r8 guard handles), a
    # purchase-first user (raw_t = 0), two events on an identical
    # timestamp (tie-breaks), a single-event user, quiet gap days, and
    # boundary-of-day timestamps.
    w("events",
      [(1, _TS(2024, 1, 1, 10, 0, 0), 1, "view", 10.0, '{"k": 1}'),
       (2, _TS(2024, 1, 1, 11, 0, 0), 1, "purchase", 99.99, '{"k": 2}'),
       (3, _TS(2024, 1, 3, 9, 30, 0), 1, "click", 0.01, '{"k": 3}'),
       (4, _TS(2024, 1, 1, 0, 0, 0), 2, "signup", 5.0, '{"k": 4}'),
       (5, _TS(2024, 1, 6, 23, 59, 59), 2, "purchase", 250.5, '{"k": 5}'),
       (6, _TS(2024, 1, 2, 12, 0, 0), 3, "view", 7.25, '{"k": 6}'),
       (7, _TS(2024, 1, 2, 12, 0, 0), 3, "click", 7.25, '{"k": 7}'),
       (8, _TS(2024, 1, 4, 8, 15, 0), 3, "purchase", 42.0, '{"k": 8}'),
       # 799.99: x = 79,999 → x⁴ ≈ 4.1e19 > 2⁶³−1 — pins the widened
       # (decimal/HUGEINT) moment accumulation the r9 scale scan fixed
       # in agg_skew_kurtosis; the shipped sf0.01 fixture tops out at
       # 490.02, just BELOW the BIGINT line, which is how seven rounds
       # of green grading missed the overflow
       (9, _TS(2024, 1, 5, 14, 0, 0), 4, "purchase", 799.99, '{"k": 9}'),
       (10, _TS(2024, 1, 5, 15, 0, 0), 4, "view", 1.0, '{"k": 10}'),
       (11, _TS(2024, 1, 10, 6, 45, 30), 5, "signup", 3.5, '{"k": 11}'),
       (12, _TS(2024, 1, 11, 7, 0, 0), 5, "error", 0.5, '{"k": 12}'),
       (13, _TS(2024, 1, 12, 7, 30, 0), 5, "purchase", 60.0, '{"k": 13}'),
       (14, _TS(2024, 1, 8, 20, 0, 0), 6, "purchase", 15.75, '{"k": 14}'),
       # adversarial props: malformed JSON, string-typed k, nested k,
       # NULL — fn_json must land them identically on both engines
       (15, _TS(2024, 1, 8, 21, 0, 0), 6, "view", 1.0, "not json at all"),
       (16, _TS(2024, 1, 8, 22, 0, 0), 6, "view", 1.0, '{"k": "12"}'),
       (17, _TS(2024, 1, 8, 23, 0, 0), 6, "view", 1.0,
        '{"k": {"nested": 1}, "u": "k\u00e4se"}'),
       (18, _TS(2024, 1, 9, 1, 0, 0), 6, "view", 1.0, None)],
      "event_id long, ts timestamp, user_id long, event_type string,"
      " value double, props string")
    open(marker, "w").close()
    return _WH


# Keys covered elsewhere or needing tables/scales this warehouse can't
# model: events (nanos parquet — unsynthesizable from Spark), the
# documents battery's families, ML/stream/similarity scale assumptions.
# sim_ann_lsh / sim_ann_ivf grade a recall-floor audit whose floor the
# 200-row warehouse embeddings can't honestly exercise, so they get
# their OWN battery corpus below (_ANN_KEYS: planted-cluster geometry
# where the floor must hold by construction) instead of this one —
# EVERY other SQL-graded key is battery-graded here: the split is
# computed from the documents battery's explicit key list so a key
# missing from every battery cannot exist silently (r8 review found
# fifteen keys falling between the prefix-based cracks).
from tests.test_fuzz_parity import _KEYS as _PARITY_KEYS  # noqa: E402

_ANN_KEYS = ("sim_ann_lsh", "sim_ann_ivf")
_SKIP_KEYS = set(_ANN_KEYS)  # skipped HERE; battery-graded in
# test_ann_parity_on_planted_clusters below


def _keys() -> list[str]:
    out = []
    for key, spec in engine.REGISTRY.items():
        if spec.oracle is None or key in _SKIP_KEYS or key in _PARITY_KEYS:
            continue
        if "events" in spec.oracle:
            continue
        out.append(key)
    return out


def _event_keys() -> list[str]:
    out = []
    for key, spec in engine.REGISTRY.items():
        if spec.oracle is None or key in _SKIP_KEYS or key in _PARITY_KEYS:
            continue
        if "events" in spec.oracle:
            out.append(key)
    return out


def test_every_sql_key_is_battery_covered():
    """The batteries (documents, relational/events, ANN planted-cluster)
    must tile the full SQL-graded registry — a key missing from every
    battery is a silent coverage hole (the r8 review found fifteen)."""
    covered = (
        set(_PARITY_KEYS) | set(_keys()) | set(_event_keys()) | set(_ANN_KEYS)
    )
    missing = [
        k for k, spec in engine.REGISTRY.items()
        if spec.oracle is not None and k not in covered
    ]
    assert not missing, f"keys in no battery: {missing}"


def _build_ann_corpus(spark) -> str:
    """Synthetic label-clustered embeddings with PLANTED neighbor
    structure (r8 verdict task 4): five tight, well-separated clusters —
    one per query — each with 15 corpus members within a small
    deterministic wiggle of its center, plus 50 far-away background
    vectors. Every query's exact top-10 therefore lies inside its own
    cluster, members sit well inside sim_ann_lsh's euclidean join
    radius, and any kmeans cell layout that separates the planted
    clusters routes nprobe=4 probes to the right cells — so the ≥0.6
    recall floors must hold off-fixture by construction, not by
    calibration to the real corpus."""
    wh = "/tmp/rf_engine_fuzz_ann_corpus"
    marker = os.path.join(wh, "_built_r9a")
    if os.path.exists(marker):
        return wh

    def vec(i: int) -> list[float]:
        if i < 80:  # clustered: queries 0-4 + 15 members each
            c = i if i < 5 else (i - 5) % 5  # cluster id
            return [
                (3.0 if c * 12 <= d < (c + 1) * 12 else 0.2)
                + ((i * 37 + d * 11) % 97) / 1940.0  # wiggle ≤ 0.05
                for d in range(64)
            ]
        # background: sign-alternating, far from every cluster
        return [
            (1.0 if (i + d) % 2 == 0 else -1.0)
            + ((i * 53 + d * 7) % 89) / 890.0
            for d in range(64)
        ]

    rows = []
    for i in range(130):
        if i < 5:
            vid = i  # queries
        elif i < 80:
            vid = 5 + (i - 5)  # cluster members: vec_id 5..79
        else:
            vid = i  # background: vec_id 80..129
        rows.append((vid, vec(i), (i % 5) if i < 80 else 9))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(wh, "embeddings.parquet")
    )
    open(marker, "w").close()
    return wh


@pytest.mark.parametrize("key", _ANN_KEYS)
def test_ann_parity_on_planted_clusters(spark, key):
    """The two ANN recall audits, graded against their own SQL oracle on
    the planted-cluster corpus through the driver's canonicalization
    path — closing the one exclusion the r8 batteries documented. A
    recall regression (bad bucketing, broken probe routing, a truth-set
    drift) flips recall_ok and hash-mismatches."""
    sf_dir = _build_ann_corpus(spark)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet/*.parquet'"
        )
        df = engine.REGISTRY[key].fn(spark, sf_dir)
        assert_parity(df, engine.REGISTRY[key].oracle, con)
        row = df.collect()[0]
        assert row["recall_ok"] is True, f"{key} recall floor failed on planted clusters"
    finally:
        con.close()


@pytest.mark.parametrize("key", _event_keys())
def test_micro_events_parity(spark, key):
    """Events-reading keys on the adversarial micro-stream — notably
    agg_kaplan_meier on a corpus where EVERY user converts inside the
    horizon, so the final risk row has d == n_risk: the exact
    terminal-day divergence the r8 guard closed (DuckDB would error on
    CAST(floor(ln(0)) AS BIGINT) while Spark silently overflowed)."""
    sf_dir = _build(spark)
    con = duckdb.connect()
    try:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings",
                  "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet/*.parquet'"
            )
        df = engine.REGISTRY[key].fn(spark, sf_dir)
        assert_parity(df, engine.REGISTRY[key].oracle, con)
    finally:
        con.close()


def test_q11_threshold_exact_boundary(spark):
    """r9 (verdict task 3): tpch_q11_value_share's global threshold is
    now derived from an exact CENT sum (BIGINT envelope sf≈5e5, vs
    sf≈500 for the old 1e6 quantum). This case pins the exactness the
    quantization buys: one part's value sits EXACTLY on the
    0.001×total threshold (1.00 of 1000.00), so a double-accumulated
    total drifting by one ulp in either engine would flip its strict->
    comparison and diverge. Both engines must derive the identical
    exact threshold and exclude the boundary part."""
    wh = "/tmp/rf_engine_fuzz_q11_boundary"
    marker = os.path.join(wh, "_built_r9a")
    if not os.path.exists(marker):
        def w(name: str, rows, schema: str):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(wh, f"{name}.parquet"))

        w("region", [(0, "EUROPE")], "r_regionkey int, r_name string")
        w("nation", [(0, "NATION_0", 0)],
          "n_nationkey int, n_name string, n_regionkey int")
        w("supplier", [(1, "Supplier#1", 0, 100.0)],
          "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
        # total = 1000.00 → threshold = 0.001 × 1000.00 = 1.0 exactly;
        # part 1's value is exactly 1.0 → strict > must EXCLUDE it.
        w("lineitem",
          [(100, 1, 1, 1, 1.0, 1.00),
           (100, 2, 1, 2, 1.0, 500.00),
           (101, 3, 1, 1, 1.0, 499.00)],
          "l_orderkey long, l_partkey long, l_suppkey long,"
          " l_linenumber int, l_quantity double, l_extendedprice double")
        open(marker, "w").close()
    con = duckdb.connect()
    try:
        for t in ("region", "nation", "supplier", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{wh}/{t}.parquet/*.parquet'"
            )
        spec = engine.REGISTRY["tpch_q11_value_share"]
        df = spec.fn(spark, wh)
        assert_parity(df, spec.oracle, con)
        keys = {r["partkey"] for r in df.collect()}
        assert keys == {2, 3}, (
            f"boundary part leaked through the strict threshold: {keys}"
        )
    finally:
        con.close()


@pytest.mark.parametrize("key", _keys())
def test_micro_warehouse_parity(spark, key):
    sf_dir = _build(spark)
    con = duckdb.connect()
    try:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet/*.parquet'"
            )
        df = engine.REGISTRY[key].fn(spark, sf_dir)
        assert_parity(df, engine.REGISTRY[key].oracle, con)
    finally:
        con.close()
