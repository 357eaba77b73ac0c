"""Sort / limit / set operators — SURVEY.md §2 B35–B41."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B35: global multi-key sort ----------------------------------------------

_B35_ORACLE = """
SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
FROM customer
ORDER BY c_acctbal DESC NULLS LAST, c_custkey
"""


@register("sort_multikey", oracle=_B35_ORACLE)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: global sort (range-partitioned exchange + per-partition sort;
    driver hashing is order-insensitive so content is what's graded, but
    the sort exchange still executes)."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy(F.col("c_acctbal").desc_nulls_last(), "c_custkey").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


# --- B36: ORDER BY + LIMIT (top-k) -------------------------------------------

_B36_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("limit_topk", oracle=_B36_ORACLE)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: TakeOrderedAndProject — per-partition top-10 heaps, then a
    driver-side merge of 10×partitions rows (never a global sort).
    Totally ordered via the unique o_orderkey tiebreak (§2 rule)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# --- B37/B38: UNION ALL / UNION DISTINCT -------------------------------------

_B37_ORACLE = """
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
"""


@register("set_union_all", oracle=_B37_ORACLE)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: UNION ALL — pure concatenation, no shuffle, no dedup."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH")
    return urgent.unionByName(high)


_B38_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_union", oracle=_B38_ORACLE)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: UNION DISTINCT = concat + hash-dedup shuffle on all columns."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


# --- B39/B40: INTERSECT / EXCEPT ---------------------------------------------

_B39_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_intersect", oracle=_B39_ORACLE)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: INTERSECT (distinct) — planned as a left-semi under dedup."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


_B40_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
"""


@register("set_except", oracle=_B40_ORACLE)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: EXCEPT DISTINCT (``subtract``, planned as left-anti under
    dedup — NOT ``exceptAll``, whose bag semantics keep multiplicity)."""
    c = load_table(spark, sf_dir, "customer")
    all_keys = c.select(F.col("c_custkey").alias("custkey"))
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return all_keys.subtract(auto)


# --- B41: DISTINCT -----------------------------------------------------------

_B41_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("distinct_rows", oracle=_B41_ORACLE)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: DISTINCT = groupBy-all-columns; partial dedup before the
    shuffle keeps wire volume at #distinct, not #rows."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()
