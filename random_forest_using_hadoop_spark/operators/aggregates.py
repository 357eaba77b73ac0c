"""Aggregation operators — SURVEY.md §2 B19–B28.

Reference analog [recon]: the reference's only aggregation is per-group
counting (majority vote + confusion matrix) done in a reducer; here the
same shape is Spark's partial+final HashAggregate, which map-side-combines
before the shuffle — the property that makes these plans hold at 100 TB
(shuffled bytes ∝ #groups, not #rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import davg, dsum, o_davg, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B19: hash aggregation, TPC-H Q1 shape (flagship query) -----------------

_B19_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum('l_quantity')} AS sum_qty,
  {o_dsum('l_extendedprice')} AS sum_base_price,
  {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {o_davg('l_quantity')} AS avg_qty,
  {o_davg('l_extendedprice')} AS avg_price,
  {o_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_hash_groupby", oracle=_B19_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: partial+final hash agg over the fact table (TPC-H Q1 shape).

    Scale: shuffle carries 6 groups × partial states, not 600k rows; the
    l_shipdate filter and the 7-column projection push into the parquet
    scan (verify: PushedFilters + ReadSchema in .explain).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
