"""Round-7 analytics additions: robust statistics, multivariate
regression, survival analysis, exponential smoothing, classifier
evaluation, and tokenizer-induction statistics.

Everything follows the engine's fixed-point doctrine (helpers.py):
float aggregation is quantized to 1e6 and summed as BIGINT so the
DuckDB oracle hash-matches bit-for-bit regardless of accumulation
order; ln/exp/pow enter only where the house precedent already trusts
them (agg_entropy, text_bigram_lm) and always on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- winsorized / trimmed mean -----------------------------------------------

# Exact rank selection (percentile_disc convention: value at rank
# ceil(p·n) under the total order (value, key)), then clamp / drop.
_WINSOR_ORACLE = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
cuts AS (
  SELECT o_orderpriority,
         MAX(n) AS n,
         MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                  THEN o_totalprice END) AS p05,
         MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                  THEN o_totalprice END) AS p95
  FROM r GROUP BY o_orderpriority
)
SELECT r.o_orderpriority,
       CAST(MAX(cuts.n) AS BIGINT) AS n_orders,
       MAX(cuts.p05) AS p05,
       MAX(cuts.p95) AS p95,
       round((CAST(SUM(CAST(floor(
           least(greatest(r.o_totalprice, cuts.p05), cuts.p95)
           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0)
         / MAX(cuts.n), 6) AS winsor_mean,
       round((CAST(SUM(CASE WHEN r.rn >= CAST(ceil(0.05 * cuts.n) AS BIGINT)
                            AND r.rn <= CAST(ceil(0.95 * cuts.n) AS BIGINT)
                  THEN CAST(floor(r.o_totalprice * 1000000.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) / 1000000.0)
         / SUM(CASE WHEN r.rn >= CAST(ceil(0.05 * cuts.n) AS BIGINT)
                    AND r.rn <= CAST(ceil(0.95 * cuts.n) AS BIGINT)
               THEN 1 ELSE 0 END), 6) AS trim_mean
FROM r JOIN cuts USING (o_orderpriority)
GROUP BY r.o_orderpriority
"""


@register("agg_winsorized_mean", oracle=_WINSOR_ORACLE)
def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clamp to [p05, p95]) and trimmed (drop outside) means
    of order totals per priority — the robust-location pair that
    survives fat-tailed value columns where the plain mean is one whale
    away from useless. Cut points are exact rank selections (value at
    rank ceil(p·n) under the total order (value, orderkey)) so the
    result is hash-exact, no interpolation.

    Scale: one shuffle partitions by priority; rank, count, and both
    sums share that sort. The group count is bounded (5 priorities), so
    the per-group frames are partition-parallel; a skewed group pays
    one sorted pass, same envelope as agg_percentile_disc.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo_rn = F.ceil(0.05 * F.col("n")).cast("bigint")
    hi_rn = F.ceil(0.95 * F.col("n")).cast("bigint")
    cuts = r.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_g"),
        F.max(F.when(F.col("rn") == lo_rn, F.col("o_totalprice"))).alias("p05"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("o_totalprice"))).alias("p95"),
    )
    j = r.join(F.broadcast(cuts), "o_orderpriority")
    q = lambda c: F.floor(c * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    in_core = (F.col("rn") >= F.ceil(0.05 * F.col("n_g")).cast("bigint")) & (
        F.col("rn") <= F.ceil(0.95 * F.col("n_g")).cast("bigint")
    )
    return j.groupBy("o_orderpriority").agg(
        F.max("n_g").cast("bigint").alias("n_orders"),
        F.max("p05").alias("p05"),
        F.max("p95").alias("p95"),
        F.round(
            (
                F.sum(
                    q(F.least(F.greatest("o_totalprice", F.col("p05")), F.col("p95")))
                ).cast("bigint")
                / 1000000.0
            )
            / F.max("n_g"),
            6,
        ).alias("winsor_mean"),
        F.round(
            (
                F.sum(F.when(in_core, q(F.col("o_totalprice"))).otherwise(F.lit(0)))
                .cast("bigint")
                / 1000000.0
            )
            / F.sum(F.when(in_core, 1).otherwise(0)),
            6,
        ).alias("trim_mean"),
    )


# --- multivariate OLS (normal equations) -------------------------------------

# y in k$ keeps the Σy² envelope inside BIGINT: |y| ≤ 105, y² ≤ 1.1e4,
# quantized 1.1e10/row → 6.6e15 at sf0.1, far under 2^63. All nine
# sufficient statistics are exact fixed-point BIGINT sums; the 3×3
# Cramer solve and R² run in double on those exact inputs, identically
# spelled on both engines, rounded to 6.
_OLS3_SUMS = """
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(x1 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(floor(x2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
         CAST(SUM(CAST(floor(y  * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(floor(x1 * x1 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s11,
         CAST(SUM(CAST(floor(x2 * x2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s22,
         CAST(SUM(CAST(floor(x1 * x2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s12,
         CAST(SUM(CAST(floor(x1 * y * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1y,
         CAST(SUM(CAST(floor(x2 * y * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2y,
         CAST(SUM(CAST(floor(y * y * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM (SELECT l_quantity AS x1, l_discount AS x2,
               l_extendedprice / 1000.0 AS y FROM lineitem)
"""

_OLS3_ORACLE = f"""
WITH s AS ({_OLS3_SUMS}),
d AS (
  SELECT CAST(n AS DOUBLE) AS n,
         s1 / 1000000.0 AS s1, s2 / 1000000.0 AS s2, sy / 1000000.0 AS sy,
         s11 / 1000000.0 AS s11, s22 / 1000000.0 AS s22,
         s12 / 1000000.0 AS s12, s1y / 1000000.0 AS s1y,
         s2y / 1000000.0 AS s2y, syy / 1000000.0 AS syy
  FROM s
),
m AS (
  SELECT *,
         n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det,
         sy * (s11 * s22 - s12 * s12)
           - s1 * (s1y * s22 - s12 * s2y)
           + s2 * (s1y * s12 - s11 * s2y) AS det0,
         n * (s1y * s22 - s12 * s2y)
           - sy * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s2y - s1y * s2) AS det1,
         n * (s11 * s2y - s1y * s12)
           - s1 * (s1 * s2y - s1y * s2)
           + sy * (s1 * s12 - s11 * s2) AS det2
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round(det0 / det, 6) AS b0,
       round(det1 / det, 6) AS b1,
       round(det2 / det, 6) AS b2,
       round(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                        - (det2 / det) * s2y)
                 / (syy - sy * sy / n), 6) AS r2
FROM m
"""


@register("agg_ols_multi", oracle=_OLS3_ORACLE)
def q_agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS by the normal equations: fit
    extended-price[k$] ~ b0 + b1·quantity + b2·discount over lineitem
    and report coefficients + R². The entire regression reduces to nine
    sufficient statistics (counts and fixed-point power sums), so the
    fit is ONE map-combinable aggregation pass — the closed-form 3×3
    Cramer solve runs on the single reduced row. Extends
    [[agg_ols_trend]] (one regressor) to the multivariate case.

    Scale: sufficient statistics are the canonical distributive
    aggregate — partial-agg on every partition, one exchange of nine
    numbers. No iteration, no driver math on data rows. The y/1000
    rescale keeps Σy² inside the BIGINT fixed-point envelope
    (helpers.py overflow note) at bench SF and far beyond.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        (F.col("l_extendedprice") / 1000.0).alias("y"),
    )
    q = lambda c: F.floor(c * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q(F.col("x1"))).cast("bigint").alias("s1"),
        F.sum(q(F.col("x2"))).cast("bigint").alias("s2"),
        F.sum(q(F.col("y"))).cast("bigint").alias("sy"),
        F.sum(q(F.col("x1") * F.col("x1"))).cast("bigint").alias("s11"),
        F.sum(q(F.col("x2") * F.col("x2"))).cast("bigint").alias("s22"),
        F.sum(q(F.col("x1") * F.col("x2"))).cast("bigint").alias("s12"),
        F.sum(q(F.col("x1") * F.col("y"))).cast("bigint").alias("s1y"),
        F.sum(q(F.col("x2") * F.col("y"))).cast("bigint").alias("s2y"),
        F.sum(q(F.col("y") * F.col("y"))).cast("bigint").alias("syy"),
    )
    d = s.select(
        F.col("n").cast("double").alias("nd"),
        F.col("n"),
        *[
            (F.col(c) / 1000000.0).alias(c)
            for c in ("s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")
        ],
    )
    n, s1, s2, sy = F.col("nd"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    return d.select(
        F.col("n").alias("n_rows"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(
            1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / (syy - sy * sy / n),
            6,
        ).alias("r2"),
    )


# --- Kaplan–Meier survival curve ---------------------------------------------

_KM_HORIZON = 7  # administrative censoring: 7-day follow-up per user

# Time-to-first-purchase from each user's first touch; users converting
# after the horizon are right-censored at it. Survival is the K-M
# product Π(1 − d/n), computed as exp of an exactly-summed quantized-ln
# series (house ln precedent: agg_entropy / text_bigram_lm).
_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         date_diff('day', MIN(CAST(ts AS DATE)),
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END)) AS raw_t
  FROM events GROUP BY user_id
),
obs AS (
  SELECT CASE WHEN raw_t IS NULL OR raw_t > {_KM_HORIZON}
              THEN {_KM_HORIZON} ELSE raw_t END AS t,
         CASE WHEN raw_t IS NOT NULL AND raw_t <= {_KM_HORIZON}
              THEN 1 ELSE 0 END AS ev
  FROM u
),
agg AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at,
         CAST(SUM(ev) AS BIGINT) AS d
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d,
         CAST((SELECT COUNT(*) FROM obs) AS BIGINT)
           - CAST(COALESCE(SUM(n_at) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
  FROM agg
),
curve AS (
  SELECT t, n_risk, d,
         CAST(SUM(CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                             * 1000000.0 + 0.5) AS BIGINT))
              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS lncum
  FROM risk WHERE d > 0 AND d < n_risk
)
SELECT t AS day, n_risk, d AS n_events,
       round(exp(lncum / 1000000.0), 6) AS survival
FROM curve
"""


@register("agg_kaplan_meier", oracle=_KM_ORACLE)
def q_agg_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase with
    right censoring at a 7-day follow-up horizon (_KM_HORIZON) — the
    estimator that handles "hasn't converted YET" correctly where a
    naive conversion rate silently drops censored users. Per event day:
    the at-risk count, event count, and the K-M product-limit survival
    estimate. Terminal-day guard: a day where d == n_risk would put
    ln(0) = -inf into the cumulative series (DuckDB errors on
    CAST(floor(-inf) AS BIGINT); Spark silently overflows), so both
    engines filter d < n_risk — the curve stops at the last day with
    survivors, identically.

    Scale: one per-user reduce (bounded by |users|), then everything —
    risk sets, the ln-quantized cumulative product — lives on a frame
    bounded by the horizon (≤ 8 rows). The single-partition windows are
    metadata-sized by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.datediff(
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.col("ts").cast("date")
                )
            ),
            F.min(F.col("ts").cast("date")),
        ).alias("raw_t")
    )
    h = F.lit(_KM_HORIZON)
    obs = u.select(
        F.when(F.col("raw_t").isNull() | (F.col("raw_t") > h), h)
        .otherwise(F.col("raw_t"))
        .alias("t"),
        F.when(F.col("raw_t").isNotNull() & (F.col("raw_t") <= h), 1)
        .otherwise(0)
        .alias("ev"),
    )
    agg = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    total = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    wprior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        agg.crossJoin(F.broadcast(total))
        .select(
            "t",
            "d",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_at").over(wprior), F.lit(0))
            )
            .cast("bigint")
            .alias("n_risk"),
        )
        .filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
    )
    lnq = F.floor(
        F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
        * 1000000.0
        + 0.5
    ).cast("bigint")
    return risk.select(
        F.col("t").cast("bigint").alias("day"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.round(
            F.exp(F.sum(lnq).over(wcum).cast("bigint") / 1000000.0), 6
        ).alias("survival"),
    )


# --- EWMA / SMA crossover ----------------------------------------------------

# Decay 1/2: every weight 0.5^k is a power of two, so weight·x is an
# EXACT double scaling (no rounding) and the quantized term sums are
# engine-identical without trusting pow beyond dyadic arguments.
_EWMA_ORACLE = """
WITH day AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           / 1000000.0 AS rev
  FROM events GROUP BY 1
),
idx AS (
  SELECT d, rev, ROW_NUMBER() OVER (ORDER BY d) - 1 AS i FROM day
),
ew AS (
  SELECT t.d, t.rev, t.i,
         CAST(SUM(CAST(floor(s.rev * power(0.5, t.i - s.i)
                             * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS num_q,
         CAST(SUM(CAST(floor(power(0.5, t.i - s.i) * 1000000.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS den_q
  FROM idx t JOIN idx s ON s.i <= t.i
  GROUP BY t.d, t.rev, t.i
),
sma AS (
  SELECT d, i,
         CAST(SUM(CAST(floor(rev * 1000000.0 + 0.5) AS BIGINT))
              OVER (ORDER BY i ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS sum_q,
         CAST(COUNT(*) OVER (ORDER BY i ROWS BETWEEN 19 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cnt
  FROM idx
),
sig AS (
  SELECT ew.d, ew.rev,
         round(CAST(ew.num_q AS DOUBLE) / ew.den_q, 6) AS ewma_fast,
         round((sma.sum_q / 1000000.0) / sma.cnt, 6) AS sma20,
         CAST(ew.num_q AS DOUBLE) / ew.den_q
           > (sma.sum_q / 1000000.0) / sma.cnt AS above
  FROM ew JOIN sma ON sma.d = ew.d
)
SELECT CAST(d AS VARCHAR) AS day, rev, ewma_fast, sma20, above,
       COALESCE(above <> LAG(above) OVER (ORDER BY d), FALSE) AS crossover
FROM sig
"""


@register("win_ewma_crossover", oracle=_EWMA_ORACLE)
def q_win_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast-EWMA vs 20-day-SMA crossover signal on the daily revenue
    series — the classic trend-following readout next to
    [[win_bollinger_bands]] / [[win_rsi_indicator]]. EWMA uses decay
    1/2 with pandas adjust=True normalization (Σ wᵏ·x / Σ wᵏ over the
    full history); every 0.5ᵏ weight is a power of two, so each
    weighted term is an exact double scaling and the fixed-point sums
    are engine-identical by construction, not by luck.

    Scale: the raw stream reduces to one row per day first; the
    EWMA self-join and SMA window run on that bounded day spine
    (O(days²) pairs of metadata-sized rows). At an unbounded horizon,
    cap the join at the ~60 days where 0.5ᵏ exceeds quantization
    resolution — weights below 1e-6 contribute exactly 0 after
    quantization anyway.
    """
    ev = load_table(spark, sf_dir, "events")
    q = lambda c: F.floor(c * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    day = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        (F.sum(q(F.col("value"))).cast("bigint") / 1000000.0).alias("rev")
    )
    idx = day.select(
        "d", "rev", (F.row_number().over(Window.orderBy("d")) - 1).alias("i")
    )
    t, s = idx.alias("t"), idx.alias("s")
    w = F.pow(F.lit(0.5), F.col("t.i") - F.col("s.i"))
    ew = (
        t.join(F.broadcast(s), F.col("s.i") <= F.col("t.i"))
        .groupBy(F.col("t.d").alias("d"), F.col("t.rev").alias("rev"))
        .agg(
            F.sum(q(F.col("s.rev") * w)).cast("bigint").alias("num_q"),
            F.sum(q(w)).cast("bigint").alias("den_q"),
        )
    )
    w20 = Window.orderBy("i").rowsBetween(-19, Window.currentRow)
    sma = idx.select(
        "d",
        F.sum(q(F.col("rev"))).over(w20).cast("bigint").alias("sum_q"),
        F.count(F.lit(1)).over(w20).cast("bigint").alias("cnt"),
    )
    sig = ew.join(sma, "d").select(
        "d",
        "rev",
        F.round(F.col("num_q").cast("double") / F.col("den_q"), 6).alias(
            "ewma_fast"
        ),
        F.round((F.col("sum_q") / 1000000.0) / F.col("cnt"), 6).alias("sma20"),
        (
            F.col("num_q").cast("double") / F.col("den_q")
            > (F.col("sum_q") / 1000000.0) / F.col("cnt")
        ).alias("above"),
    )
    wlag = Window.orderBy("d")
    return sig.select(
        F.col("d").cast("string").alias("day"),
        "rev",
        "ewma_fast",
        "sma20",
        "above",
        F.coalesce(
            F.col("above") != F.lag("above").over(wlag), F.lit(False)
        ).alias("crossover"),
    )


# --- precision / recall / F1 threshold sweep ---------------------------------

_PR_ORACLE = """
WITH scored AS (
  SELECT CAST(n_chars AS DOUBLE) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
bounds AS (
  SELECT MIN(score) AS lo, MAX(score) AS hi,
         CAST(SUM(pos) AS BIGINT) AS total_pos
  FROM scored
),
th AS (
  SELECT k, lo + k * (hi - lo) / 10.0 AS tau, total_pos
  FROM bounds CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
),
cm AS (
  SELECT th.k, th.tau, th.total_pos,
         CAST(COUNT(*) FILTER (WHERE s.score >= th.tau) AS BIGINT) AS pp,
         CAST(SUM(s.pos) FILTER (WHERE s.score >= th.tau) AS BIGINT) AS tp
  FROM th CROSS JOIN scored s
  GROUP BY th.k, th.tau, th.total_pos
)
SELECT CAST(k AS INT) AS k, round(tau, 6) AS threshold, pp, tp,
       round(CAST(tp AS DOUBLE) / pp, 6) AS precision,
       round(CAST(tp AS DOUBLE) / total_pos, 6) AS recall,
       round(2.0 * tp / (pp + total_pos), 6) AS f1
FROM cm WHERE pp > 0
"""


@register("ml_pr_curve", oracle=_PR_ORACLE)
def q_ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep over nine equal-width score thresholds
    (score = document length, positive = lang 'en' — the same proxy
    scorer as [[ml_auc_exact]] / [[ml_decile_lift]]). F1 uses the
    identity 2·TP/(PP + P), which needs no per-threshold recall/
    precision intermediates.

    Scale: the corpus reduces to a (score → count, positives) histogram
    bounded by the score domain; the 9-threshold sweep is a broadcast
    cross join against that reduced frame, never against raw documents.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    )
    hist = d.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("npos"),
    )
    bounds = d.agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.sum("pos").cast("bigint").alias("total_pos"),
    )
    ks = spark.range(1, 10).select(F.col("id").cast("int").alias("k"))
    th = ks.crossJoin(F.broadcast(bounds)).select(
        "k",
        (F.col("lo") + F.col("k") * (F.col("hi") - F.col("lo")) / 10.0).alias(
            "tau"
        ),
        "total_pos",
    )
    cm = (
        hist.crossJoin(F.broadcast(th))
        .groupBy("k", "tau", "total_pos")
        .agg(
            F.sum(F.when(F.col("score") >= F.col("tau"), F.col("cnt")))
            .cast("bigint")
            .alias("pp"),
            F.sum(F.when(F.col("score") >= F.col("tau"), F.col("npos")))
            .cast("bigint")
            .alias("tp"),
        )
        .filter(F.col("pp") > 0)
    )
    return cm.select(
        "k",
        F.round("tau", 6).alias("threshold"),
        "pp",
        "tp",
        F.round(F.col("tp").cast("double") / F.col("pp"), 6).alias("precision"),
        F.round(F.col("tp").cast("double") / F.col("total_pos"), 6).alias(
            "recall"
        ),
        F.round(2.0 * F.col("tp") / (F.col("pp") + F.col("total_pos")), 6).alias(
            "f1"
        ),
    )


# --- BPE merge-candidate pair statistics -------------------------------------

_BPE_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
pairs AS (
  SELECT tok, unnest(list_transform(range(1, length(tok)),
                     i -> substring(tok, i, 2))) AS pair
  FROM tok WHERE length(tok) >= 2
)
SELECT pair,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_tokens
FROM pairs
GROUP BY pair
ORDER BY n_occ DESC, pair
LIMIT 20
"""


@register("pipe_bpe_pair_stats", oracle=_BPE_ORACLE)
def q_pipe_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge scoreboard: frequency of every adjacent
    character pair across the whitespace-tokenized corpus, top 20 with
    deterministic ties (count desc, pair asc) — exactly the statistic a
    byte-pair-encoding tokenizer trainer maximizes at each merge step,
    plus the distinct-token support behind each pair.

    Scale: one scan explodes tokens → pairs (stateless, pipelined);
    both counts partial-agg on the pair key, whose cardinality is
    bounded by the squared alphabet, so the shuffle is metadata-sized
    no matter the corpus. The top-k is a TakeOrdered on the reduced
    frame. Iterating merges re-runs this with a rewritten token column.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") >= 2)
    )
    pairs = toks.select(
        "tok",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.countDistinct("tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(20)
    )


# --- centroid assignment (IVF cell map) --------------------------------------

_K_CENTROIDS = 8

# Seed centroids = the first K vectors by vec_id (deterministic, the
# k-means|| step-0 convention); distances via the shared left-fold dot
# product (bit-identical to DuckDB's sequential list_inner_product).
_CENTROID_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label
           FROM embeddings),
c AS (SELECT vec_id AS cid, ve AS ce FROM v WHERE vec_id < {_K_CENTROIDS}),
pairs AS (
  SELECT v.vec_id, v.label, c.cid,
         list_inner_product(v.ve, v.ve)
           - 2.0 * list_inner_product(v.ve, c.ce)
           + list_inner_product(c.ce, c.ce) AS dist2
  FROM v JOIN c ON v.vec_id >= {_K_CENTROIDS}
),
assigned AS (
  SELECT vec_id, label, cid, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cid) AS rk
  FROM pairs
)
SELECT cid AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       round((CAST(SUM(CAST(floor(dist2 * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) / 1000000.0) / COUNT(*), 6) AS avg_dist2,
       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
FROM assigned WHERE rk = 1
GROUP BY cid
"""


@register("sim_centroid_assign", oracle=_CENTROID_ORACLE)
def q_sim_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment as a standalone operator: map every corpus
    vector to its nearest of K seed centroids (squared L2, centroid-id
    tie-break) and report per-cell population, mean distance, and label
    spread — the partitioning step that [[sim_ann_ivf]] probes, exposed
    so a user can build/inspect the coarse quantizer directly.

    Scale: centroids are a K-row broadcast; the corpus streams past
    once producing K candidate rows per vector (never corpus×corpus),
    and the argmin is a per-vector window over exactly K rows. This is
    the canonical embarrassingly-parallel assignment pass of Lloyd's
    algorithm — one shuffle, bounded by K·|corpus|.
    """
    from random_forest_using_hadoop_spark.operators.similarity import (
        _dot,
        _vectors,
    )

    v = _vectors(spark, sf_dir)
    c = (
        v.filter(F.col("vec_id") < _K_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), F.col("ve").alias("ce"))
    )
    pairs = v.filter(F.col("vec_id") >= _K_CENTROIDS).join(F.broadcast(c))
    dist2 = (
        _dot(F.col("ve"), F.col("ve"))
        - 2.0 * _dot(F.col("ve"), F.col("ce"))
        + _dot(F.col("ce"), F.col("ce"))
    )
    scored = pairs.select("vec_id", "label", "cid", dist2.alias("dist2"))
    w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
    best = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    q = lambda col: F.floor(col * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    return best.groupBy(F.col("cid").alias("centroid_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.round(
            (F.sum(q(F.col("dist2"))).cast("bigint") / 1000000.0)
            / F.count(F.lit(1)),
            6,
        ).alias("avg_dist2"),
        F.countDistinct("label").cast("bigint").alias("n_labels"),
    )


# --- cumulative VWAP ---------------------------------------------------------

_VWAP_ORACLE = """
WITH day AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))
           AS BIGINT) AS notional_q,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(d AS VARCHAR) AS day,
       round(notional_q / 1000000.0, 6) AS day_notional,
       qty AS day_qty,
       round((CAST(SUM(notional_q) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              / 1000000.0)
             / CAST(SUM(qty) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
             6) AS vwap_cum
FROM day
"""


@register("win_vwap_cumulative", oracle=_VWAP_ORACLE)
def q_win_vwap_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative volume-weighted average price over the ship-date
    calendar: Σnotional/Σquantity expanding from the first day —
    completing the market-microstructure family next to
    [[win_ohlc_candles]] / [[win_bollinger_bands]]. Integer cents-scale
    numerators and integer quantity denominators end to end; the only
    division is the final one.

    Scale: the raw table reduces to one row per day first (partial-agg
    on the scan); both running sums live on that bounded day spine, so
    the unpartitioned window is metadata-sized. At multi-year × multi-
    symbol scale, partition the window by symbol.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = lambda c: F.floor(c * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    day = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(q(F.col("l_extendedprice"))).cast("bigint").alias("notional_q"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return day.select(
        F.col("d").cast("string").alias("day"),
        F.round(F.col("notional_q") / 1000000.0, 6).alias("day_notional"),
        F.col("qty").alias("day_qty"),
        F.round(
            (F.sum("notional_q").over(wcum).cast("bigint") / 1000000.0)
            / F.sum("qty").over(wcum).cast("bigint"),
            6,
        ).alias("vwap_cum"),
    )


# --- per-source duplication rate ---------------------------------------------

_DUPRATE_ORACLE = """
WITH fp AS (
  SELECT source, md5(text) AS h FROM documents
),
g AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c
  FROM fp GROUP BY source, h
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_removable,
       round(CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_rate
FROM g GROUP BY source
"""


@register("dedup_rate_by_source", oracle=_DUPRATE_ORACLE)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source — the per-dimension slice of
    [[dedup_exact]] / [[dedup_cluster_histogram]] that a data-mix review
    actually reads ("which feed is feeding us copies?"): docs, unique
    contents, removable rows, and the dup fraction, keyed by source.

    Scale: content hashes partial-agg on (source, md5) — the classic
    two-level reduction whose shuffle carries one row per distinct
    content per source, never per document. 100 TB-safe by the same
    argument as dedup_exact.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return g.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_removable"),
        F.round(
            (F.sum("c") - F.count(F.lit(1))).cast("double") / F.sum("c"), 6
        ).alias("dup_rate"),
    )


# --- Zipf slope of the corpus vocabulary -------------------------------------

_ZIPF_TOP = 100

# OLS of ln(freq) on ln(rank) over the top-N vocabulary; every log term
# quantized to 1e6 before the exact sums (house ln precedent), so the
# regression inputs are BIGINT-identical across engines.
_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok WHERE token <> '' GROUP BY token
),
ranked AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rk
  FROM vocab
),
pts AS (
  SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS xq,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS yq
  FROM ranked WHERE rk <= {_ZIPF_TOP}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(CAST(floor((xq / 1000000.0) * (xq / 1000000.0)
              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(floor((xq / 1000000.0) * (yq / 1000000.0)
              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(floor((yq / 1000000.0) * (yq / 1000000.0)
              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM pts
)
SELECT n AS n_points,
       round((CAST(n AS DOUBLE) * (sxy / 1000000.0)
              - (sx / 1000000.0) * (sy / 1000000.0))
           / NULLIF(CAST(n AS DOUBLE) * (sxx / 1000000.0)
              - (sx / 1000000.0) * (sx / 1000000.0), 0), 6) AS zipf_slope,
       round(((sy / 1000000.0)
              - ((CAST(n AS DOUBLE) * (sxy / 1000000.0)
                  - (sx / 1000000.0) * (sy / 1000000.0))
                 / NULLIF(CAST(n AS DOUBLE) * (sxx / 1000000.0)
                    - (sx / 1000000.0) * (sx / 1000000.0), 0))
                * (sx / 1000000.0)) / NULLIF(n, 0), 6) AS intercept,
       round(pow(CAST(n AS DOUBLE) * (sxy / 1000000.0)
                 - (sx / 1000000.0) * (sy / 1000000.0), 2)
           / NULLIF((CAST(n AS DOUBLE) * (sxx / 1000000.0)
               - (sx / 1000000.0) * (sx / 1000000.0))
              * (CAST(n AS DOUBLE) * (syy / 1000000.0)
                 - (sy / 1000000.0) * (sy / 1000000.0)), 0), 6) AS r2
FROM s
"""


@register("text_zipf_slope", oracle=_ZIPF_ORACLE)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of ln(freq)
    on ln(rank) for the top-100 terms, plus intercept and R². Natural
    text sits near slope −1; a corpus drifting toward 0 (flat) or −2
    (boilerplate-dominated) is a data-quality smell no single count
    exposes — the corpus-level cousin of [[text_char_entropy]].

    Scale: term counting partial-aggs on the token key (bounded by
    vocabulary); ranking and the regression touch only the fixed top-N
    frame, so everything past the vocab reduce is metadata-sized.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    # top-N via TakeOrdered (per-partition top-N + merge), THEN rank the
    # N-row frame — never a global-sort window over the whole vocabulary,
    # which grows with the corpus (Heaps' law)
    top = vocab.orderBy(F.col("freq").desc(), "token").limit(_ZIPF_TOP)
    ranked = top.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), "token"))
        .alias("rk"),
    )
    qf = lambda c: F.floor(c * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    pts = ranked.select(
        qf(F.log(F.col("rk").cast("double"))).alias("xq"),
        qf(F.log(F.col("freq").cast("double"))).alias("yq"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(qf((F.col("xq") / 1000000.0) * (F.col("xq") / 1000000.0)))
        .cast("bigint")
        .alias("sxx"),
        F.sum(qf((F.col("xq") / 1000000.0) * (F.col("yq") / 1000000.0)))
        .cast("bigint")
        .alias("sxy"),
        F.sum(qf((F.col("yq") / 1000000.0) * (F.col("yq") / 1000000.0)))
        .cast("bigint")
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1000000.0, F.col("sy") / 1000000.0
    sxx, sxy = F.col("sxx") / 1000000.0, F.col("sxy") / 1000000.0
    syy = F.col("syy") / 1000000.0
    # try_divide / NULLIF: a degenerate vocabulary (one term, or all
    # frequencies tied so every ln(freq) is 0) zeroes the slope or R2
    # denominator — NULL on both engines instead of an ANSI
    # DIVIDE_BY_ZERO crash (found by tests/test_fuzz_parity.py)
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    return s.select(
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.try_divide(sy - slope * sx, F.col("n")), 6).alias(
            "intercept"
        ),
        F.round(
            F.try_divide(
                F.pow(n * sxy - sx * sy, F.lit(2)),
                (n * sxx - sx * sx) * (n * syy - sy * sy),
            ),
            6,
        ).alias("r2"),
    )


# --- new vs returning users --------------------------------------------------

_NVR_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
fd AS (
  SELECT user_id, MIN(d) AS first_d FROM du GROUP BY user_id
)
SELECT CAST(du.d AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN du.d = fd.first_d THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN du.d = fd.first_d THEN 0 ELSE 1 END) AS BIGINT)
         AS n_returning,
       round(CAST(SUM(CASE WHEN du.d = fd.first_d THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS new_share
FROM du JOIN fd USING (user_id)
GROUP BY du.d
"""


@register("agg_new_vs_returning", oracle=_NVR_ORACLE)
def q_agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-seen vs returning — the
    growth-accounting readout that [[agg_retention_cohort]]'s triangle
    doesn't surface directly: per day, actives, news, returners, and
    the new-user share.

    Scale: the stream first reduces to distinct (day, user) rows, then
    first-seen days reduce on user_id; the final join is an equi-join
    on user_id between two already-reduced frames and the day rollup is
    a bounded-cardinality hash agg. No windows, no per-event state.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    fd = du.groupBy("user_id").agg(F.min("d").alias("first_d"))
    is_new = (F.col("d") == F.col("first_d")).cast("int")
    return (
        du.join(fd, "user_id")
        .groupBy(F.col("d").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(is_new).cast("bigint").alias("n_new"),
            F.sum(1 - is_new).cast("bigint").alias("n_returning"),
            F.round(F.sum(is_new).cast("double") / F.count(F.lit(1)), 6).alias(
                "new_share"
            ),
        )
    )


# --- inter-order gap distribution --------------------------------------------

_GAPS_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders
),
gaps AS (
  SELECT CAST(date_diff('day', prev_d, o_orderdate) AS BIGINT) AS gap
  FROM seq WHERE prev_d IS NOT NULL
),
h AS (
  SELECT gap, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY gap
),
cum AS (
  SELECT gap, c,
         CAST(SUM(c) OVER (ORDER BY gap
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cc,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM h
)
SELECT MAX(n) AS n_gaps,
       round((CAST(SUM(gap * c) AS BIGINT) * 1.0) / MAX(n), 6) AS mean_gap,
       MIN(CASE WHEN cc >= CAST(ceil(0.5 * n) AS BIGINT) THEN gap END)
         AS p50_gap,
       MIN(CASE WHEN cc >= CAST(ceil(0.9 * n) AS BIGINT) THEN gap END)
         AS p90_gap
FROM cum
"""


@register("agg_interorder_gaps", oracle=_GAPS_ORACLE)
def q_agg_interorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival analysis of the order stream: the distribution of
    day gaps between a customer's consecutive orders — count, mean, and
    exact p50/p90 — the purchasing-cadence statistic behind reorder
    prediction and churn cutoffs.

    Scale: the per-customer LAG shares one shuffle partitioned by
    custkey (partition-parallel, no global window). Exact percentiles
    come from the integer gap HISTOGRAM (bounded by the calendar span),
    cumulated on that metadata-sized frame — never a global sort of all
    gaps, the same trick as [[agg_mannwhitney_u]] / [[ml_auc_exact]].
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_orderdate", F.lag("o_orderdate").over(w).alias("prev_d")
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        F.datediff("o_orderdate", "prev_d").cast("bigint").alias("gap")
    )
    h = gaps.groupBy("gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = h.select(
        "gap",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cc"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    at = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("cc") >= F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("gap"),
        )
    )
    return cum.agg(
        F.max("n").alias("n_gaps"),
        F.round(
            (F.sum(F.col("gap") * F.col("c")).cast("bigint") * 1.0)
            / F.max("n"),
            6,
        ).alias("mean_gap"),
        at(0.5).alias("p50_gap"),
        at(0.9).alias("p90_gap"),
    )


# --- SQL API surface: multi-CTE pipeline over temp views ---------------------

_SQLAPI_SQL = """
WITH rev AS (
  SELECT c.c_nationkey,
         CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
           AS BIGINT) AS cents
  FROM {o} o JOIN {c} c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
),
named AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name, rev.cents
  FROM rev
  JOIN {n} n ON n.n_nationkey = rev.c_nationkey
  JOIN {r} r ON r.r_regionkey = n.n_regionkey
),
ranked AS (
  SELECT region_name, nation_name, cents,
         ROW_NUMBER() OVER (PARTITION BY region_name
                            ORDER BY cents DESC, nation_name) AS rk
  FROM named
)
SELECT region_name, nation_name,
       round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue, rk
FROM ranked WHERE rk <= 3
"""


@register(
    "sql_cte_pipeline",
    oracle=_SQLAPI_SQL.format(o="orders", c="customer", n="nation", r="region"),
)
def q_sql_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point exercised end to end: register temp views and
    run a multi-CTE ANSI query (revenue rollup → dimension naming →
    top-3 nations per region) through ``spark.sql`` — proving a user
    can drive this engine with plain SQL text, not just the DataFrame
    API. The statement is byte-shared with the oracle up to view names.

    Scale: identical to the DataFrame plan Catalyst would build — the
    fact rollup partial-aggs on custkey→nationkey, dims broadcast, the
    rank runs per region on the ≤|nations| reduced frame. SQL text in,
    same physical plan out.
    """
    for t in ("orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlapi_{t}")
    return spark.sql(
        _SQLAPI_SQL.format(
            o="sqlapi_orders",
            c="sqlapi_customer",
            n="sqlapi_nation",
            r="sqlapi_region",
        )
    )


# --- gzip-JSON sink round trip ----------------------------------------------

_JSONGZ_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(0 AS BIGINT) AS n_roundtrip_mismatch
FROM documents
"""


@register("sink_json_gzip", oracle=_JSONGZ_ORACLE)
def q_sink_json_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-JSON interchange round trip: stage the documents
    metadata (with an md5 content fingerprint standing in for the body)
    as gzip-compressed JSON lines, read it back under a DECLARED schema
    (no inference — schema drift should fail loudly), and grade
    totals plus an exact anti-join mismatch count of 0. JSONL+gzip is
    the lingua franca for corpus interchange; this pins both codec
    fidelity and schema round-tripping.

    Scale: write and read are embarrassingly parallel per file; the
    mismatch audit is an equi-join on doc_id between two scans. gzip is
    non-splittable — per-file parallelism comes from the partition
    count at write time, which is why the stage writes multiple parts.
    """
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("fp")
    )
    root = _tmp(sf_dir, "json_gz")
    out = os.path.join(root, "docs")
    d.repartition(4).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(out)
    back = spark.read.schema(
        "doc_id bigint, lang string, n_chars bigint, fp string"
    ).json(out)
    mism = (
        d.alias("a")
        .join(back.alias("b"), "doc_id", "full_outer")
        .filter(
            (F.col("a.fp") != F.col("b.fp"))
            | F.col("a.fp").isNull()
            | F.col("b.fp").isNull()
            | (F.col("a.n_chars") != F.col("b.n_chars"))
            | (F.col("a.lang") != F.col("b.lang"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    stats = back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    return stats.crossJoin(F.broadcast(mism)).select(
        "n_rows",
        "n_docs",
        "chars_total",
        "n_langs",
        F.col("m").alias("n_roundtrip_mismatch"),
    )


# --- BFS hop distance over the co-activity graph -----------------------------

_BFS_SEED_LT = 5  # seed set: graph nodes with user_id < 5
_BFS_MAX_HOPS = 4
_BFS_MIN_SHARED = 3  # same edge rule as graph_triangle_count

_BFS_ORACLE = f"""
WITH RECURSIVE slot AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
  FROM events
),
e AS (
  SELECT a.user_id AS a, b.user_id AS b
  FROM slot a JOIN slot b
    ON a.event_type = b.event_type AND a.hr = b.hr
   AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BFS_MIN_SHARED}
),
edges AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
nodes AS (SELECT DISTINCT a AS u FROM edges),
walk(u, d) AS (
  SELECT u, 0 FROM nodes WHERE u < {_BFS_SEED_LT}
  UNION
  SELECT e.b, w.d + 1
  FROM walk w JOIN edges e ON e.a = w.u
  WHERE w.d < {_BFS_MAX_HOPS}
),
dist AS (SELECT u, MIN(d) AS hops FROM walk GROUP BY u)
SELECT CAST(hops AS INT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_users
FROM dist GROUP BY hops
"""


@register("graph_bfs_hops", oracle=_BFS_ORACLE)
def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the user co-activity graph (same edge
    rule as [[graph_triangle_count]]): exact minimum hop distance from
    a seed set, reported as users-per-hop — the reachability kernel
    behind influence radius, contamination spread, and "within N
    degrees" queries. The oracle is a recursive CTE, so the hash match
    proves the iterative frontier expansion equals the declarative
    transitive closure.

    Scale: each round is one equi-join of the current distance frame
    against the edge list plus a min-aggregate — the textbook
    message-passing BFS, bounded at _BFS_MAX_HOPS rounds.
    localCheckpoint truncates the growing plan per round exactly as in
    [[dedup_connected_components]]; no driver-side graph state.
    """
    ev = load_table(spark, sf_dir, "events")
    slot = ev.select(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).distinct()
    e = (
        slot.alias("x")
        .join(
            slot.alias("y"),
            (F.col("x.event_type") == F.col("y.event_type"))
            & (F.col("x.hr") == F.col("y.hr"))
            & (F.col("x.user_id") < F.col("y.user_id")),
        )
        .groupBy(F.col("x.user_id").alias("a"), F.col("y.user_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _BFS_MIN_SHARED)
        .select("a", "b")
    )
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    nodes = edges.select(F.col("a").alias("u")).distinct()
    dist = nodes.select(
        "u",
        F.when(F.col("u") < _BFS_SEED_LT, 0).otherwise(F.lit(None)).alias("d"),
    ).localCheckpoint()
    for _ in range(_BFS_MAX_HOPS):
        nbr = (
            dist.filter(F.col("d").isNotNull())
            .join(edges, F.col("u") == F.col("a"))
            .groupBy(F.col("b").alias("u2"))
            .agg(F.min(F.col("d") + 1).alias("nd"))
        )
        dist = (
            dist.join(nbr, dist.u == nbr.u2, "left")
            .select(
                "u",
                F.least(
                    F.coalesce("d", F.lit(10**9)),
                    F.coalesce("nd", F.lit(10**9)),
                ).alias("d"),
            )
            .select(
                "u",
                F.when(F.col("d") < 10**9, F.col("d")).alias("d"),
            )
            .localCheckpoint()
        )
    return (
        dist.filter(F.col("d").isNotNull())
        .groupBy(F.col("d").cast("int").alias("hops"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


# --- ABC (80/95) classification ----------------------------------------------

_ABC_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
           AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
c AS (
  SELECT l_partkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(SUM(cents) OVER () AS BIGINT) AS tot
  FROM pr
),
cls AS (
  SELECT CASE WHEN cum * 1.0 / tot <= 0.80 THEN 'A'
              WHEN cum * 1.0 / tot <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         cents, tot
  FROM c
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       round(CAST(SUM(cents) AS DOUBLE) / MAX(tot), 6) AS revenue_share
FROM cls GROUP BY abc_class
"""


@register("agg_abc_classification", oracle=_ABC_ORACLE)
def q_agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts covering the first 80% of
    cumulative revenue are class A, the next 15% B, the tail C —
    reported as per-class part counts, revenue, and share. The
    full-curve generalization of [[agg_pareto_point]]'s single 80%
    crossing.

    Scale: per-part revenue reduces on the natural key, then the
    cumulative sum uses the same distributed two-pass pattern as
    agg_pareto_point — approx-percentile value slices, per-slice
    windows in parallel, an un-partitioned window only over the ≤33-row
    slice partials — so no WindowExec ever sees the full part frame.
    Cumulative sums are exact integers: the 0.80/0.95 cuts are
    deterministic, never a float-accumulation coin flip.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    n_slices = 32
    pcts = [i / n_slices for i in range(1, n_slices)]
    bounds = pr.agg(
        F.percentile_approx("cents", F.array(*[F.lit(p) for p in pcts]), 2000)
        .alias("bnds")
    )
    sliced = (
        pr.crossJoin(F.broadcast(bounds))
        .withColumn(
            "slice", F.size(F.filter("bnds", lambda b: b > F.col("cents")))
        )
        .drop("bnds")
    )
    partials = sliced.groupBy("slice").agg(F.sum("cents").alias("psum"))
    wp = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    prefix = partials.select(
        "slice",
        F.coalesce(F.sum("psum").over(wp), F.lit(0)).alias("pre_sum"),
        F.sum("psum").over(wall).alias("tot"),
    )
    ws = Window.partitionBy("slice").orderBy(
        F.col("cents").desc(), "l_partkey"
    )
    cum = (
        sliced.withColumn(
            "cum_loc",
            F.sum("cents").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .join(F.broadcast(prefix), "slice")
        .select(
            "cents",
            (F.col("pre_sum") + F.col("cum_loc")).cast("bigint").alias("cum"),
            F.col("tot").cast("bigint").alias("tot"),
        )
    )
    cls = cum.select(
        F.when(F.col("cum") * 1.0 / F.col("tot") <= 0.80, "A")
        .when(F.col("cum") * 1.0 / F.col("tot") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "tot",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.round(F.sum("cents").cast("double") / F.max("tot"), 6).alias(
            "revenue_share"
        ),
    )


# --- quoted / multiline CSV robustness ---------------------------------------

_CSVQ_ORACLE = """
WITH t AS (
  SELECT doc_id,
         'pre,"' || substr(text, 1, 10) || '"' || chr(10) || 'post,' AS tricky
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(length(tricky)) AS BIGINT) AS len_total,
       CAST(0 AS BIGINT) AS n_roundtrip_mismatch
FROM t
"""


@register("scan_csv_quoted_multiline", oracle=_CSVQ_ORACLE)
def q_scan_csv_quoted_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV robustness round trip for the fields that break naive
    parsers: values containing commas, double quotes, AND embedded
    newlines. Build such a column, write CSV (writer quotes/escapes as
    needed), read it back in multiLine mode, and grade totals plus an
    exact zero-mismatch audit — proving the quote/escape/newline
    round trip is lossless, not just that some rows came back.

    Scale note: multiLine CSV parsing is NOT splittable (a record
    boundary can't be found mid-file), so parallelism = file count —
    which is why the stage writes multiple parts, and why columnar
    formats win for anything beyond ingest. This operator exists to
    pin the ingest edge case, not to recommend the format.
    """
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('pre,"'),
            F.substring("text", 1, 10),
            F.lit('"\npost,'),
        ).alias("tricky"),
    )
    root = _tmp(sf_dir, "csv_quoted")
    out = os.path.join(root, "tricky")
    d.repartition(4).write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("doc_id bigint, tricky string")
        .csv(out)
    )
    mism = (
        d.alias("a")
        .join(back.alias("b"), "doc_id", "full_outer")
        .filter(
            F.col("a.tricky").isNull()
            | F.col("b.tricky").isNull()
            | (F.col("a.tricky") != F.col("b.tricky"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    stats = back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum(F.length("tricky")).cast("bigint").alias("len_total"),
    )
    return stats.crossJoin(F.broadcast(mism)).select(
        "n_rows",
        "n_docs",
        "len_total",
        F.col("m").alias("n_roundtrip_mismatch"),
    )


# --- T5-style span-corruption manifest ---------------------------------------

_SPAN_RATE = 15  # mask ~15% of token positions

# Deterministic portable masking: position (doc_id, pos) is masked iff
# md5-derived value mod 100 < rate — the same hash both engines compute
# (idiom shared with the Count-Min / Bloom sketches). Span starts are
# masked positions whose predecessor is unmasked.
_SPANC_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, generate_subscripts(s, 1) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
),
m AS (
  SELECT doc_id, pos,
         CASE WHEN ('0x' || substr(md5(doc_id || ':' || pos), 1, 15))::BIGINT
                   % 100 < {_SPAN_RATE} THEN 1 ELSE 0 END AS msk
  FROM tok
),
s AS (
  SELECT doc_id, pos, msk,
         CASE WHEN msk = 1 AND COALESCE(LAG(msk) OVER (
                  PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS span_start
  FROM m
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(msk) AS BIGINT) AS n_masked,
       CAST(SUM(span_start) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN msk = 1 THEN pos ELSE 0 END) AS BIGINT)
         AS mask_pos_checksum,
       round(CAST(SUM(msk) AS DOUBLE) / COUNT(*), 6) AS mask_rate
FROM s GROUP BY doc_id
"""


@register("pipe_span_corruption", oracle=_SPANC_ORACLE)
def q_pipe_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption manifest: deterministically mask ~15%
    of token positions per document (portable md5 decision per
    (doc, position)) and report tokens, masked count, SPAN count
    (consecutive masked positions collapse into one sentinel — the
    denoising objective's unit), a position checksum pinning exactly
    which tokens were chosen, and the realized mask rate. Rerunnable
    byte-identically on any cluster — the property a pretraining recipe
    needs for resumable preprocessing.

    Scale: tokenize-explode is stateless on the scan; the span-start
    LAG partitions by doc_id (parallel, frame = one document); the
    rollup partial-aggs on doc_id. Nothing global anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"))
    msk = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        < _SPAN_RATE
    ).cast("int")
    m = tok.select("doc_id", "pos", msk.alias("msk"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    s = m.select(
        "doc_id",
        "pos",
        "msk",
        (
            (F.col("msk") == 1)
            & (F.coalesce(F.lag("msk").over(w), F.lit(0)) == 0)
        )
        .cast("int")
        .alias("span_start"),
    )
    return s.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("msk").cast("bigint").alias("n_masked"),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        F.sum(F.when(F.col("msk") == 1, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("mask_pos_checksum"),
        F.round(F.sum("msk").cast("double") / F.count(F.lit(1)), 6).alias(
            "mask_rate"
        ),
    )


# --- per-document TF-IDF keyword extraction ----------------------------------

_KW_TOPK = 3

_KW_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE tok <> '' GROUP BY doc_id, tok
),
df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok) AS rk
  FROM scored
)
SELECT doc_id,
       string_agg(tok, ',' ORDER BY rk) AS keywords
FROM ranked WHERE rk <= {_KW_TOPK}
GROUP BY doc_id
"""


@register("text_keyword_tfidf_topk", oracle=_KW_ORACLE)
def q_text_keyword_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-3 terms by smoothed
    TF-IDF (tf · (ln((N+1)/(df+1)) + 1), the classic sklearn smoothing
    [[text_tokens_tfidf]] also uses), with deterministic (score, term)
    tie-breaks, emitted as one ordered comma-joined keyword string per
    document — the summarization/tagging primitive downstream search
    and clustering both want.

    Scale: term frequencies partial-agg on (doc, term); document
    frequencies on term (bounded by vocabulary, broadcast back); the
    rank window partitions by doc_id — frame = one document's distinct
    terms, embarrassingly parallel. The only global value is the
    single-row corpus count.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _KW_TOPK
    )
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), F.col("tok")))
                ),
                lambda x: x["tok"],
            ),
            ",",
        ).alias("keywords")
    )
