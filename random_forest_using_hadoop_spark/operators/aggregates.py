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

from random_forest_using_hadoop_spark.helpers import local_rows
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


# --- B20: global aggregate (no grouping keys) --------------------------------

_B20_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       {o_dsum('l_quantity')} AS sum_qty,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
"""


@register("agg_global", oracle=_B20_ORACLE)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: grand aggregate — partial per partition, single final state."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# --- B21: exact COUNT(DISTINCT) ----------------------------------------------

_B21_ORACLE = """
SELECT COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(DISTINCT o_orderpriority) AS n_prio
FROM orders
"""


@register("agg_distinct", oracle=_B21_ORACLE)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: exact distinct — Catalyst expands to a two-phase aggregate
    (Expand + partial dedup before the shuffle), so distinct keys, not
    rows, cross the wire."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


# --- B22: approximate count-distinct (HLL; engine-specific sketch → rows-only)


_B22_ORACLE = """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS parts_within_rsd,
       TRUE AS orders_within_rsd
FROM lineitem
"""


@register("agg_approx_distinct", oracle=_B22_ORACLE)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: HyperLogLog++ distinct estimate. Sketch values are
    engine-specific (Spark HLL ≠ DuckDB HLL), so the graded projection
    carries the exact counts (oracle recomputes them) plus the HLL
    guarantee as booleans: |approx − exact| / exact ≤ 3×rsd (rsd=0.02).

    Scale: constant-size sketch per partition replaces the exact
    expand+dedup shuffle — at 100 TB this is the only affordable
    distinct on a high-cardinality key. The exact counts here are the
    sf0.01 audit, not the production path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.countDistinct("l_partkey").alias("ep"),
        F.countDistinct("l_orderkey").alias("eo"),
    ).first()
    return local_rows(spark, 
        [
            (
                row["ep"],
                row["eo"],
                abs(row["ap"] - row["ep"]) / row["ep"] <= 0.06,
                abs(row["ao"] - row["eo"]) / row["eo"] <= 0.06,
            )
        ],
        "exact_parts long, exact_orders long, "
        "parts_within_rsd boolean, orders_within_rsd boolean",
    )


# --- B23: filtered / conditional aggregation ---------------------------------

_B23_ORACLE = f"""
SELECT l_returnflag,
       {o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
       {o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
       COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_filtered", oracle=_B23_ORACLE)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: SUM(CASE WHEN …) / FILTER-style conditional aggregation —
    one pass over the fact computes every branch."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias("qty_f"),
        dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias("qty_o"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_disc"),
    )


# --- B24/B25/B26: GROUPING SETS / ROLLUP / CUBE ------------------------------

_B24_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n,
       {o_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", oracle=_B24_ORACLE)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: GROUPING SETS with grouping() disambiguation of the NULL
    super-aggregate rows (data is null-free, so NULL keys are
    unambiguous markers here — grouping() still demonstrates the
    general-case idiom)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_b24")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem_b24
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


_B25_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       {o_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("agg_rollup", oracle=_B25_ORACLE)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: ROLLUP hierarchy (status → status×priority → grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue")
    )


_B26_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       {o_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=_B26_ORACLE)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: CUBE — all 2² grouping combinations in one Expand pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue")
    )


# --- B27: array aggregation --------------------------------------------------

_B27_ORACLE = """
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_collect", oracle=_B27_ORACLE)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: collect_set + sort_array (sorted ⇒ deterministic across
    partition orders; the §2 rule for any collected list).

    The collected list is serialized with concat_ws: the driver's pandas
    canonicalizer cannot hash array cells (r1 agg_collect crash), so no
    registered query may emit an array-typed column.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --- B28: statistical aggregates ---------------------------------------------

# stddev/var/corr are hand-rolled from exact decimal power sums, and the
# inputs are scaled to thousands first: the exact sums are identical
# doubles in both engines, but the var/corr cancellation (sxx - sx²/n)
# amplifies last-ulp differences in the *scalar* arithmetic (FMA vs
# non-FMA) — measured ~1e-5 absolute at 1e10 magnitude, which round(6)
# can't absorb. At ~2e4 magnitude the same noise is ~1e-11 and round(6)
# makes both sides bit-identical.
_B28_ORACLE = """
WITH s AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST((o_totalprice / 1000.0) * (o_totalprice / 1000.0) AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(o_custkey / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST((o_custkey / 1000.0) * (o_custkey / 1000.0) AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST((o_totalprice / 1000.0) * (o_custkey / 1000.0) AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
         ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       ROUND((sxx - sx * sx / n) / NULLIF(n - 1, 0), 6) AS var_kprice,
       ROUND(sqrt(greatest((sxx - sx * sx / n) / NULLIF(n - 1, 0), 0)), 6)
         AS stddev_kprice,
       ROUND((sxy - sx * sy / n) /
             NULLIF(sqrt(greatest(sxx - sx * sx / n, 0))
                    * sqrt(greatest(syy - sy * sy / n, 0)), 0),
             6) AS corr_price_cust,
       median_price
FROM s
"""


@register("agg_stats", oracle=_B28_ORACLE)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: variance / stddev / correlation (on price/custkey scaled to
    thousands — see oracle comment) / exact median per group, via exact
    decimal power sums and interpolated percentile (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``)."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice") / 1000.0
    y = F.col("o_custkey") / 1000.0
    d18, d30 = "decimal(18,6)", "decimal(30,6)"
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(d18)).cast("double").alias("sx"),
        F.sum((x * x).cast(d30)).cast("double").alias("sxx"),
        F.sum(y.cast(d18)).cast("double").alias("sy"),
        F.sum((y * y).cast(d30)).cast("double").alias("syy"),
        F.sum((x * y).cast(d30)).cast("double").alias("sxy"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 6).alias("median_price"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    # try_divide / NULLIF: a single-order priority group zeroes the
    # Bessel divisor (and a zero-variance side zeroes the corr
    # denominator) — NULL on both engines instead of an ANSI
    # DIVIDE_BY_ZERO crash (found by tests/test_fuzz_relational.py's
    # micro warehouse; the shipped fixture has no 1-row group)
    return agg.select(
        "o_orderpriority",
        "n",
        F.round(F.try_divide(sxx - sx * sx / n, n - 1), 6).alias("var_kprice"),
        # greatest(·, 0) before each sqrt: DECIMAL(30,6) per-row
        # rounding can leave sxx - sx²/n a tiny negative for a
        # constant-value group — DuckDB sqrt(negative) hard-errors,
        # Spark yields NaN; clamp identically on both engines
        F.round(
            F.sqrt(
                F.greatest(F.try_divide(sxx - sx * sx / n, n - 1), F.lit(0.0))
            ),
            6,
        ).alias("stddev_kprice"),
        F.round(
            F.try_divide(
                sxy - sx * sy / n,
                F.sqrt(F.greatest(sxx - sx * sx / n, F.lit(0.0)))
                * F.sqrt(F.greatest(syy - sy * sy / n, F.lit(0.0))),
            ),
            6,
        ).alias("corr_price_cust"),
        "median_price",
    )


# --- salted two-phase aggregation for hot keys (SURVEY §4.3) -----------------

_SALTED_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n,
       {o_dsum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register("agg_salted_hotkey", oracle=_SALTED_ORACLE)
def q_agg_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on the maximally skewed shape: 100k
    rows collapsing into 5 event_type groups.

    Phase 1 groups by (event_type, pmod(event_id, 16)) so each hot key's
    rows land on 16 reducers; phase 2 merges the 5×16 partials. For
    algebraic aggs Spark's map-side combine already defuses this skew —
    the helper exists for the cases it can't (distinct-state aggs,
    collect_list, single-key blowouts), and this query pins the pattern's
    correctness: the salted plan must hash-match the plain groupBy
    oracle exactly (fixed-point partials make the merge order-free).
    """
    from random_forest_using_hadoop_spark.helpers import salted_agg

    ev = load_table(spark, sf_dir, "events")
    result = salted_agg(
        ev,
        keys=["event_type"],
        salt_col=F.pmod(F.col("event_id"), F.lit(16)),
        aggs={
            "n": (
                lambda _: F.count(F.lit(1)),
                lambda p: F.sum(p),
            ),
            "total_value_fp": (
                lambda _: F.sum(
                    F.floor(F.col("value") * 1e6 + 0.5).cast("bigint")
                ),
                lambda p: F.sum(p),
            ),
        },
    )
    return result.select(
        "event_type",
        "n",
        (F.col("total_value_fp") / 1e6).alias("total_value"),
    )


# --- histogram: equi-width bucketing -----------------------------------------

# Dialect-shared SQL (run verbatim on Spark and DuckDB): floor-division
# bucketing instead of width_bucket (absent in DuckDB 1.0); 5e1 keeps
# the division DOUBLE-typed in both parsers. SUM is cast back to BIGINT
# because DuckDB widens SUM(int) to HUGEINT, which the driver's pandas
# bridge renders float64 and hash-mismatches Spark's bigint (r1 lesson).
_HIST_SQL = """
SELECT CAST(floor(n_chars / 5e1) AS BIGINT) * 50 AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


@register("agg_histogram", oracle=_HIST_SQL)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of document lengths (50-char buckets) — the
    distribution profile behind every quality-filter threshold choice.

    Scale: bucketing is a stateless projection; the agg shuffles one
    partial state per (partition, bucket) — a histogram over 100 TB
    costs one scan regardless of bucket count. Exact integer stats, so
    the cross-engine hash needs no float policy at all.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_HIST_SQL)


# --- mergeable HLL sketch rollup ----------------------------------------------

_SKETCH_ORACLE = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS nd
  FROM events GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       (SELECT CAST(SUM(nd) AS BIGINT) FROM d) AS sum_daily_exact,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_total_users,
       TRUE AS est_within_bound
"""


@register("agg_sketch_rollup", oracle=_SKETCH_ORACLE)
def q_agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL sketches of active
    users, unioned into a total without touching raw rows again —
    alongside the exact count for an error audit.

    Scale: THE pattern for distinct-counts at 100 TB. Exact distinct
    shuffles every (day, user) pair; a sketch table shuffles one ~1.5 KB
    sketch per day, pre-aggregates map-side, and — unlike an exact
    count — yesterday's sketches union with today's without re-scanning
    history. HLL union is register-wise max: order-insensitive,
    deterministic, and safe to re-run. Spark's Datasketches estimate
    won't equal DuckDB's HLL, so the graded projection carries the
    exact counts (oracle recomputes in SQL) plus the sketch accuracy
    guarantee as a boolean: |est − exact| / exact ≤ 0.1 (HLL default
    lgK=12 → rsd ≈ 1.6%).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    row = (
        daily.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
            F.sum("exact_daily").alias("sum_daily_exact"),
        )
        .crossJoin(ev.agg(F.count_distinct("user_id").alias("exact_total")))
        .first()
    )
    return local_rows(spark, 
        [
            (
                row["n_days"],
                row["sum_daily_exact"],
                row["exact_total"],
                abs(row["est"] - row["exact_total"]) / row["exact_total"] <= 0.1,
            )
        ],
        "n_days long, sum_daily_exact long, exact_total_users long, "
        "est_within_bound boolean",
    )


# --- bitmap-exact distinct counting -------------------------------------------

_BITMAP_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through bitmap aggregation (the
    Databricks/Snowflake bitmap pattern): key ids are bucketed
    (bitmap_bucket_number), each bucket aggregates a fixed-size bitmap
    of bit positions, and the distinct count is the sum of per-bucket
    popcounts. The oracle is plain COUNT(DISTINCT) — the hash match
    proves bitmap distinct is exact, not approximate.

    Scale: this is the shape that replaces count-distinct expansion at
    100 TB — bitmap partials are fixed-size, MERGEABLE (bitmap_or_agg
    rolls buckets up a date ladder the way [[agg_sketch_rollup]] merges
    HLLs, but without the error bar), and combine map-side, so the
    shuffle carries (group, bucket, 4KB bitmap) rows instead of one row
    per distinct id. Two hash aggs, both partial+final.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = e.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("bigint").alias("n_users")
    )


# --- boolean / conditional aggregate family ----------------------------------

_BOOL_ORACLE = """
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'P') AS any_pending,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_boolean_family", oracle=_BOOL_ORACLE)
def q_agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates per group: count_if, every
    (bool_and), any (bool_or) — the predicate-rollup surface that data
    quality checks and assertion frameworks compile to (e.g. "all rows
    in this partition pass constraint X").

    Scale: all three are algebraic aggregates with trivial partial
    state (a count, two booleans) — they combine map-side like count/
    sum, so constraint checks over 100 TB cost one scan and a 5-group
    shuffle. Spark count_if/every/any ≡ DuckDB count_if/bool_and/
    bool_or, pinned here.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).cast("bigint").alias("n_large"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
