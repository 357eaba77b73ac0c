"""Relational extensions — subqueries, argmax aggregation, reshaping.

Beyond the SURVEY.md §2 letter-keys: the query shapes a reference user
reaches for next once the core surface exists. Subqueries exercise
Catalyst's decorrelation/rewrite machinery (scalar subquery → broadcast
of a 1-row relation; IN/NOT IN → null-aware semi/anti join; correlated
aggregate → aggregate-then-rejoin, TPC-H Q17 style) — we declare the SQL
and let the optimizer pick the physical form, per SURVEY §4.2.

The subquery SQL strings are dialect-shared ANSI: the SAME text runs on
Spark (``spark.sql`` over temp views) and DuckDB (the oracle), so the
check is literally one query, two engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import davg, o_davg, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# --- uncorrelated scalar subquery --------------------------------------------


def _fp_sum(expr: str) -> str:
    """Fixed-point sum (helpers.dsum policy) in dialect-shared SQL.

    Literals are scientific notation on purpose: Spark parses `1000000.0`
    as DECIMAL (poisoning every downstream type to DECIMAL, which a
    stringifying hash distinguishes from DuckDB's DOUBLE), but `1e6`
    is DOUBLE in both dialects.
    """
    return (
        f"CAST(SUM(CAST(floor(({expr}) * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)"
        " / 1e6"
    )


# Threshold is the fixed-point global mean (helpers.dsum policy inlined
# as SQL): bit-identical in both engines, so the > comparison partitions
# the rows identically and the aggregate hash-matches.
_FP_AVG_PRICE = f"{_fp_sum('o_totalprice')} / COUNT(o_totalprice)"

_SCALAR_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_above,
       {_fp_sum('o_totalprice')} AS sum_above
FROM orders
WHERE o_totalprice > (SELECT {_FP_AVG_PRICE} FROM orders)
GROUP BY o_orderpriority
"""


@register("subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global mean price.

    Scale: Catalyst plans the subquery as its own aggregate job and
    broadcasts the 1-row result into the outer filter (Subquery +
    ReusedExchange in .explain) — the fact side is scanned once per
    plan, never per row.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(_SCALAR_SQL)


# --- IN / NOT IN subqueries → semi / null-aware anti join --------------------

_IN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_cust
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@register("subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries: segment counts of customers in two regions
    who never placed an urgent order.

    Scale: Catalyst rewrites IN → LeftSemi (nation side broadcast) and
    NOT IN → null-aware LeftAnti on the urgent-order key set; neither
    materializes the subquery payload columns. The anti-join build side
    is DISTINCT custkeys, shuffled only if above the broadcast
    threshold.
    """
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(_IN_SQL)


# --- correlated aggregate subquery (TPC-H Q17 shape) -------------------------

# AVG here is exact cross-engine: l_quantity is integer-valued (1..50),
# so per-partkey sums are exact doubles regardless of accumulation order.
_CORR_SQL = f"""
SELECT COUNT(*) AS n_small,
       {_fp_sum('l_extendedprice')} / 7e0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND p.p_type = 'ECONOMY'
  AND l.l_quantity < (SELECT 2e-1 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@register("subquery_correlated", oracle=_CORR_SQL)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (TPC-H Q17): lineitems below 20% of
    their part's average quantity, for one brand/type slice.

    Scale: Catalyst decorrelates to a per-partkey aggregate joined back
    on l_partkey — one extra shuffle keyed the same as the join, NOT a
    per-row re-scan. The brand/type filter broadcasts through the part
    dim, so both lineitem scans prune to the slice's partkeys via
    dynamic partition/runtime filters where the layout allows.
    """
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_CORR_SQL)


# --- argmax aggregation: max_by / arg_max ------------------------------------

# Single sortable BIGINT rank value (DuckDB 1.0 arg_max takes no struct
# ordering): price quantized to cents × 1e10 + orderkey. Unique by
# construction (orderkey tiebreak) → deterministic argmax both engines.
# Envelope: 6e7 cents × 1e10 ≈ 6e17 < 2^63.
_RANK_SQL = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) * 10000000000 + o_orderkey"

_ARGMAX_ORACLE = f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       arg_max(o_orderkey, {_RANK_SQL}) AS best_orderkey,
       MAX(o_totalprice) AS top_price
FROM orders
GROUP BY o_custkey
"""


@register("agg_argmax", oracle=_ARGMAX_ORACLE)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation: each customer's most expensive order in ONE
    hash aggregate (max_by), no window, no self-join-back.

    Scale: the classic "latest row per key" is often written as
    row_number-over-window + filter, which sorts every partition;
    max_by keeps it a partial+final hash agg — shuffle ∝ #keys, no
    sort. The rank value packs (price, orderkey) into one BIGINT so the
    argmax is total-ordered and replay-deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    rank = (
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
        * F.lit(10_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max_by("o_orderkey", rank).alias("best_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


# --- pivot: long → wide ------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       {o_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@register("reshape_pivot", oracle=_PIVOT_ORACLE)
def q_reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status into wide columns per priority.

    Scale: the status domain is passed explicitly to ``pivot`` — with an
    inferred domain Spark first runs a distinct job over the fact table
    to discover values, an extra full scan nobody wants at 100 TB. With
    explicit values the pivot is a single partial+final hash aggregate
    (one CASE-fed state per pivot value), shuffle ∝ #priorities.
    """
    from random_forest_using_hadoop_spark.helpers import dsum

    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    totals = o.groupBy("o_orderpriority").agg(
        dsum("o_totalprice").alias("total_price")
    )
    return wide.join(totals, "o_orderpriority").select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        "total_price",
    )


# --- unpivot: wide → long ----------------------------------------------------

_UNPIVOT_ORACLE = f"""
WITH w AS (
  SELECT p_brand,
         {o_davg('p_retailprice')} AS avg_price,
         {o_davg('CAST(p_size AS DOUBLE)')} AS avg_size
  FROM part GROUP BY p_brand
)
SELECT p_brand, 'avg_price' AS metric, avg_price AS value FROM w
UNION ALL
SELECT p_brand, 'avg_size' AS metric, avg_size AS value FROM w
"""


@register("reshape_unpivot", oracle=_UNPIVOT_ORACLE)
def q_reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) per-brand metrics from wide to long form.

    Scale: ``unpivot`` is a stateless Expand projection — each input row
    fans out to #metrics rows with no shuffle; the only exchange is the
    upstream per-brand aggregate.
    """
    p = load_table(spark, sf_dir, "part")
    wide = p.groupBy("p_brand").agg(
        davg("p_retailprice").alias("avg_price"),
        davg(F.col("p_size").cast("double")).alias("avg_size"),
    )
    return wide.unpivot(
        ["p_brand"], ["avg_price", "avg_size"], "metric", "value"
    )


# --- correlated LATERAL subquery ----------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
"""


@register("subquery_lateral", oracle=_LATERAL_SQL)
def q_subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — "for each outer row, the top-2 of a
    correlated inner query" — the dialect-shared SQL runs VERBATIM on
    both engines. Semantically kin to [[topk_per_group]], but the
    declaration exercises a different planner path: Catalyst must
    decorrelate the per-row LIMIT subquery into a ranked join (a
    per-outer-row rescan would be quadratic), which is exactly the
    rewrite that makes LATERAL usable on a big outer side.

    Scale: post-decorrelation the plan is the window-rank shape — one
    shuffle on the correlation key, rank, filter — so it inherits
    topk_per_group's scaling; the (c_acctbal DESC, c_custkey) order is
    total, making the 2-row cut deterministic cross-engine.
    """
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


# --- SCD2 point-in-time join -------------------------------------------------

_SCD2_ORACLE = """
WITH dim AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER w AS version,
         o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER w,
                  TIMESTAMP '9999-12-31 00:00:00') AS valid_to
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
fact AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate, l.l_quantity
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
)
SELECT d.version,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT d.o_custkey) AS BIGINT) AS n_customers
FROM fact f
JOIN dim d
  ON f.custkey = d.o_custkey
 AND f.l_shipdate >= d.valid_from AND f.l_shipdate < d.valid_to
GROUP BY d.version
"""


@register("join_scd2_pointintime", oracle=_SCD2_ORACLE)
def q_join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 point-in-time join: build the
    versioned dimension (each customer's order history as half-open
    validity intervals via LEAD, 9999-12-31 sentinel on the open
    version) and resolve each Q1-1997 returned line to the version in
    effect at ship time.

    Scale: the dim build is one window pass partitioned by the natural
    key. The point-in-time join is an EQUI-join on custkey with the
    interval predicate as a residual filter — fan-out before the
    filter is bounded by versions-per-customer (tens), never
    quadratic, and exactly one version survives per fact row because
    the intervals tile the timeline. This is the standard warehouse
    SCD2 plan; a BETWEEN-only join (no equi key) would be the
    nested-loop mistake.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        "o_custkey",
        F.row_number().over(w).alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("9999-12-31 00:00:00").cast("timestamp_ntz"),
        ).alias("valid_to"),
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    fact = li.join(
        o.select("o_orderkey", F.col("o_custkey").alias("custkey")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("custkey", "l_shipdate")
    resolved = fact.join(dim, fact.custkey == dim.o_custkey).filter(
        (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("l_shipdate") < F.col("valid_to"))
    )
    return resolved.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
    )
