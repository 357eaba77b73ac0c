"""Composed pipeline showcases — classic TPC-H shapes built from the
engine's own operator set (filter pushdown → broadcast dims → fact join →
partial+final agg → deterministic top-k), proving the operators compose
into the multi-stage queries a reference user actually runs.

Adapted to the driver's star schema: ``orders`` has no o_shippriority,
so Q3 carries o_orderpriority; date bands sit inside the measured
1995..2001 o_orderdate domain (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import dsum, o_dsum, r6
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# --- TPC-H Q3 shape: shipping-priority top-10 --------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 orders for one segment.

    Scale: the segment filter prunes customer before its broadcast; the
    orders⋈lineitem join shuffles on the order key with both date
    filters pushed to the scans; revenue is fixed-point (bit-identical
    ranking → the LIMIT is stable cross-engine, with l_orderkey as the
    total-order tiebreak); top-10 is TakeOrderedAndProject, never a
    global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-01-01 00:00:00")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --- TPC-H Q10 shape: returned-item revenue top-20 ---------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter.

    Scale: the quarter filter cuts orders before the fact join; nation
    broadcasts; the returnflag filter pushes into the lineitem scan.
    The agg keys on the customer (plus its functional dependents), so
    the shuffle carries one state per customer — then a stable top-20.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# --- TPC-H Q5 shape: local-supplier volume per nation ------------------------

_Q5_ORACLE = f"""
SELECT n.n_name,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("tpch_q5_local_supplier", oracle=_Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer and the
    supplier share the nation, within one region and one year.

    Scale: the only big⋈big join is lineitem⋈orders on the order key;
    supplier, nation, and region (region-filtered before the join)
    all broadcast, so the c_nationkey = s_nationkey theta-leg costs
    nothing extra — it rides the broadcast hash probe instead of a
    second shuffle. Final agg carries ≤25 nation groups, so the
    partial/final combine collapses the output map-side.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# --- TPC-H Q14 shape: promotion revenue share --------------------------------

_Q14_ORACLE = f"""
SELECT {o_dsum("CASE WHEN p.p_type LIKE 'PROMO%' "
               "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
         AS promo_revenue,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
       round(100.0 * ({o_dsum("CASE WHEN p.p_type LIKE 'PROMO%' "
               "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")})
             / ({o_dsum('l.l_extendedprice * (1 - l.l_discount)')}), 6)
         AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@register("tpch_q14_promo_revenue", oracle=_Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts —
    a conditional aggregate over a broadcast fact⋈dim join.

    Scale: the one-month shipdate band prunes the lineitem scan
    (pushed filter + row-group skipping on the sorted-ish date); part
    broadcasts, so no shuffle at all before the single global agg.
    Both sums are fixed-point; the ratio divides the two exact values
    once and rounds to 6, so the percentage hashes identically
    cross-engine.
    """
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(disc).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            r6(
                100.0 * F.col("promo_revenue") / F.col("total_revenue")
            ).alias("promo_pct"),
        )
    )


# --- TPC-H Q18 shape: large-volume customers ---------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@register("tpch_q18_large_volume", oracle=_Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-20 orders whose total quantity exceeds 300,
    with their customer — the classic HAVING-subquery pipeline.

    Scale: the quantity rollup reduces lineitem to one row per order
    BEFORE any join (partial agg combines map-side), and the >300
    filter then keeps ~0.1% of orders — so the joins against orders
    and customer move a tiny filtered set. l_quantity is integral, so
    the plain double sum is exact and order-insensitive; top-20 is
    TakeOrderedAndProject with o_orderkey as the total-order tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )
