"""Composed TPC-H-shape pipelines, part 2 — the harder join topologies:
EXISTS decorrelation (Q4), bi-nation volume (Q7), market share with a
ratio-of-aggregates (Q8), profit rollup (Q9), outer-join distribution
(Q13), OR-bracket pushdown (Q19), and anti-join + scalar subquery (Q22).

Together with pipelines.py (Q1/Q3/Q5/Q10/Q14/Q18 shapes) this gives the
engine the full classic decision-support topology zoo. Shapes are
adapted to the driver's reduced star schema (no partsupp table, no
commit/receipt dates, no ship modes — FIXTURES.md): each docstring says
what stands in for the missing column and why the join/agg shape — the
thing being exercised — is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import dsum, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# --- Q4 shape: order-priority checking via EXISTS ----------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("tpch_q4_priority_exists", oracle=_Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with a qualifying
    lineitem (EXISTS → LeftSemi). The schema has no commit/receipt
    dates, so ``l_returnflag = 'R'`` is the qualifying predicate; the
    decorrelated-EXISTS shape is identical.

    Scale: the semi join carries only l_orderkey after the flag filter
    (column pruning reaches the scan) and stops probing an order at its
    first match — no duplicate explosion, no distinct needed. The
    5-group count agg is map-side partial.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q7 shape: bi-nation shipping volume -------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_bination_volume", oracle=_Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two trading nations by
    year, over the 6-table snowflake with a symmetric nation-pair
    predicate.

    Scale: supplier/customer/nation are broadcast (the largest,
    customer, is ~15 MB·SF); lineitem⋈orders is the only shuffle and
    the 2-year shipdate band is pushed to the lineitem scan. The
    OR-of-pairs predicate evaluates post-join on broadcast-joined
    columns — Catalyst can't split it, but it filters before the agg
    shuffle, so the aggregate moves only matching pairs' rows.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8 shape: national market share -----------------------------------------

_NUM = "CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 1000000.0 + 0.5) AS BIGINT)"

_Q8_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_NUM} ELSE 0 END) AS BIGINT)
         / CAST(SUM({_NUM}) AS BIGINT) AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


@register("tpch_q8_market_share", oracle=_Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's PROMO
    revenue per year — the full 8-table snowflake with a conditional
    ratio-of-aggregates.

    Scale: every dimension broadcasts; lineitem⋈orders is again the
    single shuffle. Both SUMs are fixed-point BIGINT (exact, order-
    insensitive), so the final double division is bit-identical across
    engines — the ratio needs no rounding fudge. Zero-denominator years
    can't occur (the region+type filter still leaves rows every year;
    verified at sf0.01/sf0.1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    vol = F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 1_000_000.0 + 0.5
    ).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9 shape: product-line profit by nation and year ------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity')} AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("tpch_q9_product_profit", oracle=_Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on '%gear%' parts by supplier nation and
    order year. No partsupp table exists, so unit cost stands in as
    ``0.1 × p_retailprice`` (documented constant); the 5-table join +
    LIKE-filtered dimension + two-level group-by is the Q9 topology.

    Scale: part (LIKE-filtered), supplier, and nation broadcast;
    lineitem⋈orders shuffles once on orderkey. The profit expression is
    computed pre-agg (codegen, no UDF) and summed fixed-point. The LIKE
    '%gear%' can't prune the parquet scan (unanchored), but it cuts the
    broadcast build side to ~1/6 before shipping.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --- Q13 shape: customer order-count distribution ----------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13_order_distribution", oracle=_Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, with a
    filtering predicate inside the LEFT JOIN's ON clause (so customers
    with only excluded orders still appear with count 0). The schema
    has no o_comment, so the NOT-LIKE-special-requests predicate
    becomes a priority exclusion; the outer-join-then-double-agg shape
    is exact.

    Scale: COUNT(o_orderkey) over the left join counts matches only
    (NULLs from preserved rows don't count) — no CASE needed. First agg
    shuffles on c_custkey (high cardinality, even); the histogram
    re-agg moves one row per customer and collapses to ~40 groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q19 shape: OR-bracketed discounted revenue ------------------------------

_Q19_ORACLE = f"""
SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
"""


@register("tpch_q19_bracket_revenue", oracle=_Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed (brand, size,
    quantity) brackets spanning both join sides. No l_shipmode /
    l_shipinstruct exist; the three-bracket OR across part and lineitem
    columns is the planner exercise.

    Scale: Catalyst derives the single-side residuals — part rows
    outside all three (brand, size) envelopes drop before the
    broadcast, lineitem rows with quantity outside [1, 50] drop at the
    scan — then the mixed OR evaluates post-join. One global fixed-
    point sum; no shuffle at all besides the final single-row agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 50)
        )
    )
    return joined.filter(bracket).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# --- Q22 shape: dormant high-balance customers -------------------------------

_Q22_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {o_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (
        SELECT (CAST(SUM(CAST(floor(c2.c_acctbal * 1000000.0 + 0.5)
                     AS BIGINT)) AS BIGINT) / 1000000.0) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
GROUP BY nation
ORDER BY nation
"""


@register("tpch_q22_dormant_customers", oracle=_Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average-
    balance customers who never placed an URGENT order — scalar
    subquery (global AVG) + NOT EXISTS (LeftAnti). No c_phone exists,
    so nation replaces the country-code substring as the grouping key;
    "dormant" = no '1-URGENT' order, because at sf≤0.01 every customer
    has *some* order and a bare NOT EXISTS would be vacuously empty —
    this predicate yields 5/75/937 rows at sf0.001/0.01/0.1 (measured),
    so the anti-join and threshold actually get exercised at grading SF.

    Scale: the AVG is a one-row global aggregate, cross-joined in
    (broadcast of a single row) rather than collect()ed, so the plan
    stays fully lazy/distributed. The anti join probes the filtered
    orders on o_custkey; nation broadcasts. The AVG threshold is a
    fixed-point mean (helpers.davg shape): a raw double AVG drifts with
    accumulation order at the ulp level, and while the measured margin
    here (min |c_acctbal − avg| ≥ 0.07 at all three SFs) dwarfs that
    noise, the exact-integer form costs nothing and removes the
    fixture dependence (r7 latent-bug audit, same class as Q11).
    """
    from random_forest_using_hadoop_spark.helpers import davg

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # Global mean of positive balances, kept as a (broadcast) 1-row frame.
    mean_row = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(mean_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nation")
    )
