"""Window-function operators — SURVEY.md §2 B29–B34.

Reference analog [recon]: the argmax in majority voting is the only
"window-shaped" computation the reference does; here the full analytic
surface runs as one shuffle on the partition key + a per-partition sort.

Determinism doctrine: every ORDER BY carries a unique tiebreak key
(o_orderkey / event_id) so rank-dependent output is identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B29: ranking functions --------------------------------------------------

_B29_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("win_rank", oracle=_B29_ORACLE)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: row_number / rank / dense_rank over one window spec."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --- B30: lag / lead ---------------------------------------------------------

_B30_ORACLE = """
SELECT event_id, user_id, ts,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("win_lag_lead", oracle=_B30_ORACLE)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: inter-event gap per user (lag on epoch-µs → bigint, immune
    to interval-type differences) + lead of the next event type."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# --- B31: moving aggregate, ROWS frame ---------------------------------------

_B31_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
         AS moving_rev
FROM orders
"""


@register("win_moving_rows", oracle=_B31_ORACLE)
def q_win_moving_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: 3-row moving revenue. A ≤3-term double sum in deterministic
    frame order is bit-identical across engines; round(6) is cosmetic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 6).alias("moving_rev"),
    )


# --- B32: RANGE frame --------------------------------------------------------

_B32_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_rev
FROM orders
"""


@register("win_range_frame", oracle=_B32_ORACLE)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: value-based RANGE frame — cumulative revenue by order date;
    same-date orders share a frame edge, so the running sum goes through
    exact decimals (arbitrary-order accumulation inside the frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("cum_rev"),
    )


# --- B33: analytic functions -------------------------------------------------

_B33_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey)
         OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@register("win_analytic", oracle=_B33_ORACLE)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: ntile / percent_rank / cume_dist / first+last value. The
    last_value frame is widened to the full partition (the SQL default
    frame stops at CURRENT ROW — a classic silent-wrong-answer)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


# --- B34: top-K per group ----------------------------------------------------

_B34_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


@register("topk_per_group", oracle=_B34_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: top-3 orders per customer (BASELINE q_window_topk shape).

    Scale: Spark rewrites rank-filter patterns with a WindowGroupLimit
    (per-partition top-K pushdown before the full sort materializes).
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- forward fill (last non-null over an ordered frame) -----------------------

_FFILL_ORACLE = """
WITH spine AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
purch AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(floor(SUM(floor(value * 1000000 + 0.5))) AS BIGINT) AS v_fixed
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
       round(last_value(p.v_fixed IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) / 1000000.0, 6) AS last_purchase_value,
       p.v_fixed IS NULL AS is_filled
FROM spine s LEFT JOIN purch p ON p.user_id = s.user_id AND p.day = s.day
"""


@register("win_forward_fill", oracle=_FFILL_ORACLE)
def q_win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill: on each user's activity-day spine, carry the most
    recent daily purchase total across days without purchases — the
    last-observation-carried-forward pass that turns sparse
    observations into model-ready features. Exercises the IGNORE NULLS
    ordered-frame semantics (``last(ignorenulls=True)`` ≡ DuckDB
    ``last_value(... IGNORE NULLS)``, verified identical including
    all-leading-NULL partitions).

    Scale: one shuffle on user_id serves both the purchase agg and the
    fill window (same partitioning); frames are ROWS-bounded running
    state, so the window is a single ordered pass per user, no
    re-scan per row. Daily sums are fixed-point so the filled value is
    bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    spine = ev.select("user_id", day.alias("day")).distinct()
    # sum the quantized ints DIRECTLY (dsum's divided double times 1e6
    # re-truncates: 128.729999... × 1e6 → off-by-one fixed value)
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day.alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(
            F.sum(
                F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("v_fixed")
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(purch, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.round(
                F.last("v_fixed", ignorenulls=True).over(w) / 1_000_000.0, 6
            ).alias("last_purchase_value"),
            F.col("v_fixed").isNull().alias("is_filled"),
        )
    )


# --- running distinct count (first-occurrence rewrite) ------------------------

_RUNDISTINCT_ORACLE = """
WITH ed AS (
  SELECT DISTINCT user_id, event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
firsts AS (
  SELECT user_id, event_type, MIN(day) AS first_day
  FROM ed GROUP BY 1, 2
),
days AS (SELECT DISTINCT user_id, day FROM ed)
SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day,
       CAST(COUNT(f.event_type) AS BIGINT) AS n_types_seen
FROM days d LEFT JOIN firsts f
  ON f.user_id = d.user_id AND f.first_day <= d.day
GROUP BY d.user_id, d.day
"""


@register("win_running_distinct", oracle=_RUNDISTINCT_ORACLE)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct event types seen per user by each active day
    — running COUNT(DISTINCT), which no engine supports as a window
    frame. The scalable rewrite: mark each (user, type)'s FIRST day
    (one agg), convert to a per-day increment, and running-SUM the
    increments over the user's day spine — distinct-so-far without any
    distinct state in the window at all.

    Scale: two shuffles on user-rooted keys (first-occurrence agg, day
    spine) and one ordered ROWS window; state per window row is a
    single counter. The oracle instead recomputes via the quadratic
    first_day ≤ day join — the hash match proves the increment rewrite
    equals the definitional form. Fan-out is |distinct types| per user
    (bounded, 5 here), never |events|.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    ed = ev.select("user_id", "event_type", day.alias("day")).distinct()
    firsts = ed.groupBy("user_id", "event_type").agg(
        F.min("day").alias("first_day")
    )
    incr = firsts.groupBy("user_id", F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    days = ed.select("user_id", "day").distinct()
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        days.join(incr, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .select(
            "user_id",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.sum("new_types").over(w).cast("bigint").alias("n_types_seen"),
        )
    )
