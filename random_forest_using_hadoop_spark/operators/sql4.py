"""Spark-4 SQL-surface operators: recursive CTEs (`WITH RECURSIVE`,
new in Spark 4.0) and SQL pipe syntax (`|>` operators, Spark 4.0's
SQL-pipeline dialect) — both driven through `spark.sql` text, proving
the engine's SQL entry point covers the modern surface, not just the
ANSI core that sql_cte_pipeline pins.

Reference analog: none citable (the reference checkout is empty —
SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- recursive CTE -------------------------------------------------------------

# Byte-shared between spark.sql and the DuckDB oracle up to the view
# name: customer keys form an implicit binary tree (parent = floor
# (key/2), root = 1), and the recursion walks every customer's
# ancestor chain ACCUMULATING balance cents — a genuinely iterative
# computation (the accumulator joins the customer dim at every level),
# not a closed form the optimizer could collapse.
_RECURSIVE_SQL = """
WITH RECURSIVE chain(custkey, node, cents) AS (
  SELECT c_custkey, c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
  FROM {c}
  UNION ALL
  SELECT ch.custkey, p.c_custkey,
         ch.cents + CAST(floor(p.c_acctbal * 100 + 0.5) AS BIGINT)
  FROM chain ch
  JOIN {c} p ON p.c_custkey = CAST(floor(ch.node / 2) AS BIGINT)
  WHERE ch.node > 1
),
lens AS (
  SELECT custkey, CAST(COUNT(*) AS BIGINT) AS path_len
  FROM chain GROUP BY custkey
),
roots AS (
  SELECT custkey, cents AS path_cents FROM chain WHERE node = 1
)
SELECT lens.path_len,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(roots.path_cents) AS BIGINT) AS total_path_cents
FROM lens JOIN roots ON lens.custkey = roots.custkey
GROUP BY lens.path_len
"""


@register(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL.format(c="customer"),
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE through `spark.sql` (`WITH RECURSIVE`, Spark 4.0):
    every customer's ancestor chain in the implicit binary tree
    (parent = floor(key/2)) is walked to the root, accumulating
    balance cents level by level — each recursion step JOINS the
    customer dimension, so the fixpoint really iterates ~log2(N)
    rounds of join+union, the shape hierarchies/BOM walks take on real
    warehouses. The statement is byte-shared with the DuckDB oracle up
    to the view name, so the two engines' recursive semantics
    (termination, duplicate handling under UNION ALL, accumulator
    typing) are compared wholesale.

    Graded: per path-length (n_customers, summed root-path cents) —
    integer accumulation end to end, so the hash pins every level of
    every chain.

    Scale: Spark executes the fixpoint as iterative join+union rounds;
    each round's frontier is O(live chains), shrinking as chains
    terminate, and each join is customer-key equi (broadcastable dim).
    Depth is log2(max key) — 100 TB of customers is ~47 rounds, not a
    blowup. Negative balances make the accumulator non-monotone, so a
    MAX-based shortcut would be wrong — the `node = 1` terminal row is
    the only correct path total.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "rcte_customer"
    )
    return spark.sql(_RECURSIVE_SQL.format(c="rcte_customer"))


# --- SQL pipe syntax -----------------------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS disc_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_PIPE_SQL = """
FROM {l}
|> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
|> EXTEND CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
          AS BIGINT) AS disc_cents_row
|> AGGREGATE COUNT(*) AS n_rows,
             SUM(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty,
             SUM(disc_cents_row) AS disc_cents
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, n_rows, sum_qty, disc_cents
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX through `spark.sql` (Spark 4.0's `|>` dialect):
    the TPC-H-Q1-shape pricing summary written as a linear pipeline —
    FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> SELECT — the
    syntax Spark adopted from the GoogleSQL pipes proposal for
    readable multi-stage queries. The oracle is the classic-SQL
    rewrite, so the grade proves the pipe dialect plans to the SAME
    semantics (filter → projection → grouped aggregate), not merely
    that it parses.

    Determinism: the per-row discounted price is floored to integer
    cents in the EXTEND stage, so the AGGREGATE sums integers — the
    engine-portable doctrine every money aggregate in this repo
    follows.

    Scale: pipe stages are surface syntax — Catalyst plans the
    identical filtered partial-agg the DataFrame version gets; nothing
    about shuffle shape changes.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(_PIPE_SQL.format(l="pipe_lineitem"))
