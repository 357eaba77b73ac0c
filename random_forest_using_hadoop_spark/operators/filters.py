"""Projection / filter operators — SURVEY.md §2 B6–B9.

Reference analog [recon]: the mapper's line-parse + attribute projection.
Here every predicate is a Catalyst expression that pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B6: computed projection -------------------------------------------------

_B6_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS disc_price,
       ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
"""


@register("project_expr", oracle=_B6_ORACLE)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: arithmetic projection. Scalar IEEE double ops are bit-identical
    across engines; round(6) only guards display-level noise."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price, 6).alias("disc_price"),
        F.round(disc_price * (1 + F.col("l_tax")), 6).alias("charge"),
    )


# --- B7: comparison / BETWEEN / IN ------------------------------------------

_B7_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 10000 AND 100000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus = 'O'
"""


@register("filter_basic", oracle=_B7_ORACLE)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: range + IN + equality predicates, all pushdown-eligible."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(10000, 100000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


# --- B8: LIKE / regexp -------------------------------------------------------

_B8_ORACLE = r"""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE 'ECONOMY%'
   OR regexp_matches(p_name, '^[a-z]+ (red|blue)')
"""


@register("filter_like_regex", oracle=_B8_ORACLE)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: LIKE prefix (pushdown as StringStartsWith) + unanchored regex
    (Spark ``rlike`` ≡ DuckDB ``regexp_matches``: both search)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("ECONOMY%")
        | F.col("p_name").rlike(r"^[a-z]+ (red|blue)")
    ).select("p_partkey", "p_name", "p_type")


# --- B9: NULL handling (manufactured via outer join; testdata is null-free) --

_B9_ORACLE = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.o_orderkey, -1) AS order_marker
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IS NULL
"""


@register("filter_null_safe", oracle=_B9_ORACLE)
def q_filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: IS NULL + coalesce over nulls manufactured by a left join
    (customers with no orders). The join's dim side broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, o.o_custkey == c.c_custkey, "left")
    return joined.filter(F.col("o_orderkey").isNull()).select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_marker"),
    )
