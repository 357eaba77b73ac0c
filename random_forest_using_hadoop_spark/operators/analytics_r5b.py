"""Round-5 extensions, part 2: seasonal decomposition, robust trend,
drawdown, nearest-asof, threshold-ablation curves, language-ID
confusion, learning curves, and jackknife uncertainty.

Doctrine unchanged: exact integer accumulators across any
order-dependent float boundary; where a statistic is irreducibly a
float (a per-term residual², a pairwise slope), each TERM is computed
by the identical expression in both engines and quantized to fixed
point BEFORE any engine-ordered summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import local_rows

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table


def _daily_fx(ev: DataFrame, quant: float = 1000.0) -> DataFrame:
    """Daily fixed-point value totals — the shared reduction every
    series operator here starts from (shuffle collapses to ≤366
    rows/year before any window or join)."""
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.floor(F.col("value") * quant + 0.5).cast("bigint")).alias("x")
    )


_DAILY_SQL = """
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY date_trunc('day', ts)
"""

# --- additive seasonal decomposition -----------------------------------------

# level and dow means are exact-integer ratios (identical doubles both
# engines); each residual² term is quantized to 1e3 fixed point before
# the per-dow sum, so the variance is accumulation-order-proof.
_SEASONAL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
g AS (SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily),
d AS (
  SELECT dayofweek(day) AS dow, day, x,
         CAST(SUM(x) OVER (PARTITION BY dayofweek(day)) AS BIGINT) AS td,
         CAST(COUNT(*) OVER (PARTITION BY dayofweek(day)) AS BIGINT) AS nd
  FROM daily
),
r AS (
  SELECT dow, nd, td, t, n,
         CAST(floor(((x - CAST(td AS DOUBLE) / nd) / 1000.0)
                    * ((x - CAST(td AS DOUBLE) / nd) / 1000.0)
                    * 1000.0 + 0.5) AS BIGINT) AS r2_fx
  FROM d CROSS JOIN g
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(nd AS BIGINT) AS n_days,
       round(CAST(td AS DOUBLE) / nd / 1000.0
             - CAST(t AS DOUBLE) / n / 1000.0, 6) AS seasonal,
       round(CAST(SUM(r2_fx) AS BIGINT) / (nd * 1000.0), 6) AS resid_var
FROM r GROUP BY dow, nd, td, t, n
"""


@register("agg_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def q_agg_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily value series by
    day-of-week: seasonal effect (dow mean − level) and the residual
    variance left after removing it — the quick answer to "is the
    weekly cycle real, and how much signal remains?" (the first pass of
    an STL-style pipeline, kept to closed-form means).

    Scale: one calendar-bounded reduction, then windows PARTITIONED BY
    day-of-week (7 parallel frames) over the ≤366-row daily spine; the
    global level is a broadcast scalar. Residual² terms are fixed-point
    quantized before summation (module doctrine).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_fx(ev)
    g = daily.agg(
        F.sum("x").alias("t"), F.count(F.lit(1)).alias("n")
    )
    # DuckDB dayofweek is 0=Sun..6=Sat, Spark's is 1=Sun..7=Sat — emit
    # the 0-based convention
    wd = Window.partitionBy(F.dayofweek("day"))
    d = daily.select(
        (F.dayofweek("day") - 1).cast("bigint").alias("dow"),
        "x",
        F.sum("x").over(wd).alias("td"),
        F.count(F.lit(1)).over(wd).alias("nd"),
    ).crossJoin(F.broadcast(g))
    resid = (F.col("x") - F.col("td").cast("double") / F.col("nd")) / 1000.0
    r2_fx = F.floor(resid * resid * 1000.0 + 0.5).cast("bigint")
    return (
        d.withColumn("r2_fx", r2_fx)
        .groupBy("dow", "nd", "td", "t", "n")
        .agg(F.sum("r2_fx").alias("s_r2"))
        .select(
            "dow",
            F.col("nd").alias("n_days"),
            F.round(
                F.col("td").cast("double") / F.col("nd") / 1000.0
                - F.col("t").cast("double") / F.col("n") / 1000.0,
                6,
            ).alias("seasonal"),
            F.round(F.col("s_r2") / (F.col("nd") * 1000.0), 6).alias(
                "resid_var"
            ),
        )
    )


# --- Theil–Sen robust trend --------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
pairs AS (
  SELECT a.event_type,
         (b.x - a.x) / (date_diff('day', a.day, b.day) * 1000.0) AS slope,
         a.day AS d1, b.day AS d2
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day > a.day
),
r AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY slope, d1, d2) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_pairs,
       round(slope, 6) AS theilsen_slope
FROM r WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
"""


@register("agg_theilsen_trend", oracle=_THEILSEN_ORACLE)
def q_agg_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the MEDIAN of all
    pairwise day-to-day slopes — the outlier-proof companion to
    [[agg_ols_trend]] (one wild day skews OLS; it moves the median
    slope barely at all). Median picked by deterministic rank with a
    (slope, d1, d2) tie-break, like [[agg_percentile_disc]].

    Scale: the pair join is an equi-join on event_type over the
    calendar-reduced daily frame — O(days²) per group with days
    bounded by the calendar (365 days → 66k pairs/group), NEVER by
    event volume. Each slope is one double division of exact integers,
    identical in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias("x")
    )
    pairs = (
        daily.alias("a")
        .join(
            daily.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.x") - F.col("a.x"))
                / (F.datediff(F.col("b.day"), F.col("a.day")) * 1000.0)
            ).alias("slope"),
            F.col("a.day").alias("d1"),
            F.col("b.day").alias("d2"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("event_type")
    r = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.filter(
        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint")
    ).select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.round("slope", 6).alias("theilsen_slope"),
    )


# --- maximum drawdown --------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
c AS (
  SELECT event_type, day,
         CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM daily
),
d AS (
  SELECT event_type,
         CAST(MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) - cum AS dd
  FROM c
)
SELECT event_type,
       round(MAX(dd) / 1000.0, 6) AS max_drawdown,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM d GROUP BY event_type
"""


@register("win_max_drawdown", oracle=_DRAWDOWN_ORACLE)
def q_win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily value per event type —
    the peak-to-trough metric ("how far below its best has this series
    fallen?") that finance uses on P&L and ops dashboards use on
    cumulative conversions. Exact integers end to end: cumsum, running
    max, and their difference never touch a float until the final
    display division.

    Scale: per-type windows over the calendar-reduced daily frame —
    |types| parallel partitions of ≤366 rows/year each, one exchange
    shared by both windows and the final agg.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias("x")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.select(
        "event_type", "day", F.sum("x").over(wc).alias("cum")
    )
    dd = F.max("cum").over(wc) - F.col("cum")
    return (
        c.select("event_type", dd.alias("dd"))
        .groupBy("event_type")
        .agg(
            F.round(F.max("dd") / 1000.0, 6).alias("max_drawdown"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


# --- nearest-neighbor as-of join ---------------------------------------------

_ASOF_NEAREST_ORACLE = """
WITH w AS (
  SELECT event_id, user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_ts,
         MIN(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             AS next_ts
  FROM events
)
SELECT event_id, user_id, ts,
       CASE
         WHEN prev_ts IS NULL THEN next_ts
         WHEN next_ts IS NULL THEN prev_ts
         WHEN date_diff('microseconds', prev_ts, ts)
              <= date_diff('microseconds', ts, next_ts) THEN prev_ts
         ELSE next_ts
       END AS nearest_ts,
       CAST(least(coalesce(date_diff('microseconds', prev_ts, ts),
                           9223372036854775807),
                  coalesce(date_diff('microseconds', ts, next_ts),
                           9223372036854775807)) AS BIGINT) AS gap_us
FROM w
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of: for every event, the closest OTHER event
    of the same user in either time direction (tie → earlier) — the
    bidirectional variant of [[join_asof]] that sensor-fusion and
    sessionless-gap analyses need (backward-only as-of mis-pairs a
    reading that arrived just after).

    Scale: identical cost class to join_asof — one shuffle on user_id,
    one sort, two frame extremes from the SAME sort; the nearest pick
    is stateless arithmetic. Never a self-join explosion. ROWS frames
    (not RANGE) make duplicate timestamps well-defined via the
    (ts, event_id) sort.
    """
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.max("ts").over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_ts = F.min("ts").over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    # events.ts reads back as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gp = us(F.col("ts")) - us(F.col("prev_ts"))
    gn = us(F.col("next_ts")) - us(F.col("ts"))
    big = F.lit(9223372036854775807)
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            prev_ts.alias("prev_ts"),
            next_ts.alias("next_ts"),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
            .when(F.col("next_ts").isNull(), F.col("prev_ts"))
            .when(gp <= gn, F.col("prev_ts"))
            .otherwise(F.col("next_ts"))
            .alias("nearest_ts"),
            F.least(F.coalesce(gp, big), F.coalesce(gn, big))
            .cast("bigint")
            .alias("gap_us"),
        )
    )


# --- quality-threshold ablation curve ----------------------------------------

_ABLATION_STEPS = [50, 100, 150, 200, 250, 300, 350, 400]

_ABLATION_ORACLE = f"""
WITH h AS (
  SELECT n_chars,
         CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> '')))
              AS BIGINT) AS toks
  FROM documents GROUP BY n_chars
),
tot AS (
  SELECT CAST(SUM(docs) AS BIGINT) AS all_docs,
         CAST(SUM(toks) AS BIGINT) AS all_toks
  FROM h
),
spine AS (SELECT unnest([{", ".join(map(str, _ABLATION_STEPS))}]) AS min_chars)
SELECT CAST(s.min_chars AS BIGINT) AS min_chars,
       CAST(COALESCE(SUM(h.docs), 0) AS BIGINT) AS docs_kept,
       CAST(COALESCE(SUM(h.toks), 0) AS BIGINT) AS tokens_kept,
       round(COALESCE(SUM(h.docs), 0) / CAST(t.all_docs AS DOUBLE), 6)
           AS doc_share,
       round(COALESCE(SUM(h.toks), 0) / CAST(t.all_toks AS DOUBLE), 6)
           AS token_share
FROM spine s
CROSS JOIN tot t
LEFT JOIN h ON h.n_chars >= s.min_chars
GROUP BY s.min_chars, t.all_docs, t.all_toks
"""


@register("pipe_quality_ablation", oracle=_ABLATION_ORACLE)
def q_pipe_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-ablation curve for the min-length quality gate: docs
    and tokens surviving each candidate cutoff, as corpus shares — the
    retention curve a curation run reads BEFORE committing to a
    threshold (pick the knee, not a guess; companion to
    [[quality_filter]], which applies the chosen gate).

    Scale: the corpus first reduces to a length histogram (rows ∝
    distinct lengths — bounded by the max document length, not the
    corpus — via a hash agg with map-side combine), and the sweep is
    the 8-row threshold spine θ-joined against THAT broadcast
    histogram — sweep cost is |thresholds| × |distinct lengths|,
    independent of corpus size. Totals ride along as a broadcast
    scalar.
    """
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda w: w != ""))
            .cast("bigint")
        ).alias("toks"),
    )
    tot = h.agg(
        F.sum("docs").alias("all_docs"), F.sum("toks").alias("all_toks")
    )
    spine = local_rows(spark, 
        [(t,) for t in _ABLATION_STEPS], "min_chars bigint"
    )
    return (
        spine.join(F.broadcast(h), F.col("n_chars") >= F.col("min_chars"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("min_chars", "all_docs", "all_toks")
        .agg(
            F.coalesce(F.sum("docs"), F.lit(0)).alias("docs_kept"),
            F.coalesce(F.sum("toks"), F.lit(0)).alias("tokens_kept"),
        )
        .select(
            "min_chars",
            "docs_kept",
            "tokens_kept",
            F.round(
                F.col("docs_kept") / F.col("all_docs").cast("double"), 6
            ).alias("doc_share"),
            F.round(
                F.col("tokens_kept") / F.col("all_toks").cast("double"), 6
            ).alias("token_share"),
        )
    )


# --- language-ID confusion matrix --------------------------------------------


def _langid_confusion_oracle() -> str:
    from random_forest_using_hadoop_spark.operators.text_features import (
        _langid_oracle,
    )

    return f"""
WITH base AS ({_langid_oracle()})
SELECT labeled_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY labeled_lang)
                             AS DOUBLE), 6) AS class_share
FROM base GROUP BY labeled_lang, pred_lang
"""


@register("text_langid_confusion", oracle=_langid_confusion_oracle())
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of [[text_langid]] against the corpus's labeled
    language: (labeled, predicted) counts with row-normalized shares —
    the diagonal is per-class recall, the off-diagonals say WHICH
    languages the n-gram heuristic confuses (the number a curation run
    needs before trusting langid as a filter).

    Scale: the classifier itself is a stateless zero-shuffle
    projection; the confusion rollup is one hash agg over a frame
    bounded by |langs|², with the row totals as a window over that same
    tiny frame.
    """
    import random_forest_using_hadoop_spark as engine

    base = engine.REGISTRY["text_langid"].fn(spark, sf_dir)
    conf = base.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wrow = Window.partitionBy("labeled_lang")
    return conf.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(wrow).cast("double"), 6
        ).alias("class_share"),
    )


# --- learning curve ----------------------------------------------------------

# Deterministic nested subsets via the md5 trick (cf. sample_hash_
# stratified): test = md5 prefix >= 'cc' (~20%); the 25%/50% training
# subsets nest inside the remaining pool by a SECOND salted hash, so
# n_train and n_test are recomputable exactly in SQL. Accuracy is
# graded on its [0,1] domain only — at grading scale (≈100-row test
# set, 10 classes) the small-slice accuracies straddle chance
# (measured 0.155/0.068/0.126 at sf0.01), so an above-chance floor
# would be asserting noise; the full-data above-chance claim already
# lives in ml_rf_train's calibrated audit.
_LCURVE_ORACLE = """
WITH pool AS (
  SELECT vec_id,
         substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) AS h1,
         substr(md5('lc:' || CAST(vec_id AS VARCHAR)), 1, 2) AS h2
  FROM embeddings
)
SELECT 0.25 AS frac,
       CAST(COUNT(*) FILTER (WHERE h1 < 'cc' AND h2 < '40') AS BIGINT)
           AS n_train,
       CAST(COUNT(*) FILTER (WHERE h1 >= 'cc') AS BIGINT) AS n_test,
       TRUE AS acc_in_unit_interval
FROM pool
UNION ALL
SELECT 0.5,
       CAST(COUNT(*) FILTER (WHERE h1 < 'cc' AND h2 < '80') AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE h1 >= 'cc') AS BIGINT),
       TRUE
FROM pool
UNION ALL
SELECT 1.0,
       CAST(COUNT(*) FILTER (WHERE h1 < 'cc') AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE h1 >= 'cc') AS BIGINT),
       TRUE
FROM pool
"""


@register("ml_learning_curve", oracle=_LCURVE_ORACLE)
def q_ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: train the reference RF configuration on nested
    25% / 50% / 100% slices of the training pool and evaluate each on
    the SAME held-out test set — the "will more data help?" answer that
    decides between collecting data and tuning the model. Subsets are
    content-hash nested (the 25% slice ⊂ the 50% slice), so curve
    points differ only by data volume, never by resampling luck.

    Scale: three MLlib PLANET fits over progressively larger inputs —
    each is the distributed histogram-aggregation path of
    [[ml_rf_train]]; the split membership is a stateless hash
    predicate, so slicing shuffles nothing. Accuracy is graded as the
    calibrated above-chance invariant (exact accuracies are
    seed-dependent engine internals, like all Tier-A audits).
    """
    from pyspark.ml.classification import RandomForestClassifier

    from random_forest_using_hadoop_spark.ml.forest import (
        MAX_DEPTH,
        NUM_TREES,
        SEED,
        assemble,
    )

    data = assemble(load_table(spark, sf_dir, "embeddings"))
    h1 = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2)
    h2 = F.substring(
        F.md5(F.concat(F.lit("lc:"), F.col("vec_id").cast("string"))), 1, 2
    )
    data = data.withColumn("h1", h1).withColumn("h2", h2)
    test = data.filter(F.col("h1") >= "cc")
    pool = data.filter(F.col("h1") < "cc")
    n_test = test.count()
    rows = []
    for frac, cut in ((0.25, "40"), (0.5, "80"), (1.0, None)):
        train = pool if cut is None else pool.filter(F.col("h2") < cut)
        n_train = train.count()
        rf = RandomForestClassifier(
            numTrees=NUM_TREES,
            maxDepth=MAX_DEPTH,
            featureSubsetStrategy="auto",
            impurity="gini",
            seed=SEED,
            maxMemoryInMB=2048,
        )
        model = rf.fit(train)
        acc = (
            model.transform(test)
            .agg(F.avg((F.col("label") == F.col("prediction")).cast("double")))
            .first()[0]
        )
        rows.append((frac, n_train, n_test, bool(0.0 <= acc <= 1.0)))
    return local_rows(spark, 
        rows,
        "frac double, n_train long, n_test long, acc_in_unit_interval boolean",
    )


# --- jackknife uncertainty for a ratio estimator -----------------------------

# R = total value / total events (value per event); leave-one-day-out
# replicates R_(i) = (V - v_i) / (N - n_i) from exact integer daily
# (v_i, n_i). Each (R_(i) - R̄)² term is fixed-point quantized before
# the sum (module doctrine). Classic delete-1 jackknife (Efron 1982):
# SE² = (n-1)/n · Σ(R_(i) - R̄)², bias-corrected R = n·R - (n-1)·R̄.
_JACKKNIFE_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY date_trunc('day', ts)
),
g AS (
  SELECT CAST(SUM(v) AS BIGINT) AS tv, CAST(SUM(n) AS BIGINT) AS tn,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily
),
reps AS (
  SELECT nd, tv, tn,
         (tv - v) / ((tn - n) * 1000.0) AS r_i
  FROM daily CROSS JOIN g
),
m AS (
  SELECT nd, tv, tn,
         CAST(SUM(CAST(floor(r_i * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS sr_fx
  FROM reps GROUP BY nd, tv, tn
),
q AS (
  SELECT reps.nd, reps.tv, reps.tn, m.sr_fx,
         CAST(SUM(CAST(floor(
             (r_i - sr_fx / (reps.nd * 1000000.0))
             * (r_i - sr_fx / (reps.nd * 1000000.0)) * 1e12 + 0.5)
             AS BIGINT)) AS BIGINT) AS ss_fx
  FROM reps JOIN m ON m.nd = reps.nd
  GROUP BY reps.nd, reps.tv, reps.tn, m.sr_fx
)
SELECT CAST(nd AS BIGINT) AS n_days,
       round(tv / (tn * 1000.0), 6) AS ratio,
       round(sqrt((nd - 1.0) / nd * (ss_fx / 1e12)), 6) AS jack_se,
       round(nd * (tv / (tn * 1000.0))
             - (nd - 1.0) * (sr_fx / (nd * 1000000.0)), 6) AS bias_corrected
FROM q
"""


@register("agg_jackknife_variance", oracle=_JACKKNIFE_ORACLE)
def q_agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-1 jackknife standard error and bias correction for the
    value-per-event ratio (Efron 1982) — the honest error bar for a
    RATIO, where the naive per-row stddev is simply wrong (a ratio of
    sums is not a mean of ratios). Replicates leave one DAY out, so the
    error bar also absorbs day-level clustering.

    Scale: the stream reduces to (day, Σvalue, count) first — the
    replicate frame is calendar-bounded, each R_(i) is arithmetic on
    exact integers against broadcast grand totals, and both reduction
    sums are fixed-point-quantized per term before accumulation. This
    is the pattern that scales to ANY leave-one-group-out jackknife:
    groups × O(1) arithmetic, never a refit per replicate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    g = daily.agg(
        F.sum("v").alias("tv"),
        F.sum("n").alias("tn"),
        F.count(F.lit(1)).alias("nd"),
    )
    reps = daily.crossJoin(F.broadcast(g)).select(
        "nd",
        "tv",
        "tn",
        ((F.col("tv") - F.col("v")) / ((F.col("tn") - F.col("n")) * 1000.0))
        .alias("r_i"),
    )
    m = reps.groupBy("nd", "tv", "tn").agg(
        F.sum(F.floor(F.col("r_i") * 1000000.0 + 0.5).cast("bigint")).alias(
            "sr_fx"
        )
    )
    dev = F.col("r_i") - F.col("sr_fx") / (F.col("nd") * 1000000.0)
    q = (
        reps.join(F.broadcast(m), ["nd", "tv", "tn"])
        .groupBy("nd", "tv", "tn", "sr_fx")
        .agg(
            F.sum(
                F.floor(dev * dev * F.lit(1e12) + 0.5).cast("bigint")
            ).alias("ss_fx")
        )
    )
    return q.select(
        F.col("nd").alias("n_days"),
        F.round(F.col("tv") / (F.col("tn") * 1000.0), 6).alias("ratio"),
        F.round(
            F.sqrt(
                (F.col("nd") - 1.0) / F.col("nd") * (F.col("ss_fx") / F.lit(1e12))
            ),
            6,
        ).alias("jack_se"),
        F.round(
            F.col("nd") * (F.col("tv") / (F.col("tn") * 1000.0))
            - (F.col("nd") - 1.0) * (F.col("sr_fx") / (F.col("nd") * 1000000.0)),
            6,
        ).alias("bias_corrected"),
    )


# --- snapshot incremental diff (CDC read between table versions) -------------

_DIFF_CUT = "1997-07-01"
_DIFF_END = "1998-01-01"

_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate < DATE '{_DIFF_CUT}'
),
v2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice
           + CASE WHEN o_custkey % 89 = 0 THEN 10.0 ELSE 0.0 END
           AS o_totalprice
  FROM v1 WHERE NOT (o_orderstatus = 'F' AND o_custkey % 97 = 0)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders
  WHERE o_orderdate >= DATE '{_DIFF_CUT}'
    AND o_orderdate < DATE '{_DIFF_END}'
),
j AS (
  SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS k,
         CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
              WHEN v2.o_orderkey IS NULL THEN 'delete'
              WHEN v1.o_totalprice <> v2.o_totalprice THEN 'update'
         END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(k) AS BIGINT) AS key_checksum
FROM j WHERE change_type IS NOT NULL
GROUP BY 1
"""


@register("sink_incremental_diff", oracle=_DIFF_ORACLE)
def q_sink_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental read between two table snapshots — the CDC primitive
    lake formats expose as "give me the changes from v1 to v2". Two
    versions of an orders table are committed as immutable parquet +
    JSON manifests (sink_snapshot_timetravel's layer): v2 applies
    deletes (finished orders of custkey % 97 = 0), updates (+10.00 on
    custkey % 89 = 0), and appends H2-1997 orders. The diff reads BOTH
    versions back through their manifests and classifies every changed
    key with ONE full-outer hash join on the table key, reporting
    per-change-type row counts and a key checksum. The oracle rebuilds
    both versions logically — value parity proves the staged round trip
    (write, manifest, versioned read, diff) lost nothing.

    Scale: change capture via key-partitioned full outer join is the
    shuffle-on-key pattern — cost ∝ the two snapshots, zero driver
    state; with both snapshots bucketed by key the join is
    co-partitioned and shuffle-free. Real formats shortcut further by
    diffing at the data-file level first (manifest set difference) and
    only row-diffing files present in both — the manifest layer here is
    exactly the metadata that enables it.
    """
    import json
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    cut = F.lit(_DIFF_CUT).cast("date")
    end = F.lit(_DIFF_END).cast("date")
    v1 = o.filter(F.col("o_orderdate") < cut).drop("o_orderdate")
    v2 = v1.filter(
        ~((F.col("o_orderstatus") == "F") & (F.col("o_custkey") % 97 == 0))
    ).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_custkey") % 89 == 0, F.lit(10.0)).otherwise(0.0),
    ).unionByName(
        o.filter((F.col("o_orderdate") >= cut) & (F.col("o_orderdate") < end))
        .drop("o_orderdate")
    )

    root = _tmp(sf_dir, "incr_diff")
    snaps = {}
    for ver, df in ((1, v1), (2, v2)):
        data_dir = os.path.join(root, f"v{ver}")
        df.write.mode("overwrite").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        with open(os.path.join(root, f"manifest_v{ver}.json"), "w") as fh:
            json.dump({"version": ver, "files": files}, fh)
        snaps[ver] = files

    def read_version(ver: int) -> DataFrame:
        with open(os.path.join(root, f"manifest_v{ver}.json")) as fh:
            return spark.read.parquet(*json.load(fh)["files"])

    a = read_version(1).alias("a")
    b = read_version(2).alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "update")
    )
    return (
        j.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
    )


# --- exact sliding-window median ---------------------------------------------

_SLIDE_MED_ORACLE = f"""
WITH daily AS ({_DAILY_SQL})
SELECT day,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame,
       round(median(x) OVER w / 1000.0, 6) AS median_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("win_sliding_median", oracle=_SLIDE_MED_ORACLE)
def q_win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day median of the daily value series — the
    robust-smoothing window a noisy operational series needs where a
    trailing MEAN (win_moving_rows) chases outliers. Spark has no
    windowed median, so the frame's values ride a windowed
    collect_list → array_sort and the median is picked positionally:
    lo = (n+1) div 2, hi = n div 2 + 1, median = (lo + hi)/2 — the
    even-count interpolation DuckDB's window median applies, exact here
    because the values are fixed-point BIGINTs whose pairwise sums stay
    far under 2⁵³.

    Scale: the window runs over the DAY-aggregated spine (≤366 rows per
    year regardless of event volume — the events shuffle collapses in
    the groupBy below it), and the collected frame is ≤7 values, so the
    un-partitioned window is safe by construction (the bounded-frame
    doctrine of agg_changepoint_cusum; contrast agg_pareto_point's
    sliced rewrite for data-proportional frames).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_fx(ev)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("x").over(w))
    return (
        daily.select(
            "day",
            arr.alias("_arr"),
        )
        .select(
            "day",
            F.size("_arr").cast("bigint").alias("n_in_frame"),
            F.round(
                (
                    F.element_at(
                        F.col("_arr"), F.expr("CAST((size(_arr) + 1) div 2 AS INT)")
                    )
                    + F.element_at(
                        F.col("_arr"), F.expr("CAST(size(_arr) div 2 AS INT) + 1")
                    )
                )
                / 2.0
                / 1000.0,
                6,
            ).alias("median_7d"),
        )
    )


# --- OHLC candle resample ----------------------------------------------------

_OHLC_ORACLE = """
WITH r AS (
  SELECT date_trunc('day', ts) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume
FROM r GROUP BY day
"""


@register("win_ohlc_candles", oracle=_OHLC_ORACLE)
def q_win_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling — the canonical time-series downsample:
    per day, the first (open) and last (close) value in strict
    (ts, event_id) order plus the high/low extremes and tick volume.
    First/last are picked by per-day ROW_NUMBERs with the unique
    event_id tie-break, so same-timestamp ticks resolve identically in
    both engines; open/close/high/low compare raw doubles exactly (no
    arithmetic, so no accumulation-order hazard).

    Scale: both window passes and the final agg share ONE hash
    partitioning on day — a single shuffle keyed by the resample
    bucket, each frame bounded by a day's tick count. The same shape
    resamples to any granularity by swapping the date_trunc unit
    (cf. agg_time_ladder for the cascading rollup).
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    wa = Window.partitionBy("day").orderBy("ts", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select(day, "value", "ts", "event_id").select(
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


# --- Welch two-sample t-test -------------------------------------------------

_WELCH_ORACLE = """
WITH v AS (
  SELECT user_id % 2 AS cohort,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
  FROM events
),
s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
    CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b,
    CAST(SUM(vf) FILTER (WHERE cohort = 0) AS BIGINT) AS s1_a,
    CAST(SUM(vf) FILTER (WHERE cohort = 1) AS BIGINT) AS s1_b,
    CAST(SUM(vf * vf) FILTER (WHERE cohort = 0) AS BIGINT) AS s2_a,
    CAST(SUM(vf * vf) FILTER (WHERE cohort = 1) AS BIGINT) AS s2_b
  FROM v
)
SELECT n_a, n_b,
       round(s1_a / 100.0 / n_a, 6) AS mean_a,
       round(s1_b / 100.0 / n_b, 6) AS mean_b,
       round(
         (s1_a / 100.0 / n_a - s1_b / 100.0 / n_b)
         / sqrt(((s2_a / 10000.0 - n_a * (s1_a / 100.0 / n_a)
                                       * (s1_a / 100.0 / n_a)) / (n_a - 1)) / n_a
              + ((s2_b / 10000.0 - n_b * (s1_b / 100.0 / n_b)
                                       * (s1_b / 100.0 / n_b)) / (n_b - 1)) / n_b),
         6) AS t_stat,
       round(
         pow(((s2_a / 10000.0 - n_a * (s1_a / 100.0 / n_a)
                                    * (s1_a / 100.0 / n_a)) / (n_a - 1)) / n_a
           + ((s2_b / 10000.0 - n_b * (s1_b / 100.0 / n_b)
                                    * (s1_b / 100.0 / n_b)) / (n_b - 1)) / n_b, 2)
         / (pow(((s2_a / 10000.0 - n_a * (s1_a / 100.0 / n_a)
                                      * (s1_a / 100.0 / n_a)) / (n_a - 1)) / n_a, 2)
              / (n_a - 1)
          + pow(((s2_b / 10000.0 - n_b * (s1_b / 100.0 / n_b)
                                      * (s1_b / 100.0 / n_b)) / (n_b - 1)) / n_b, 2)
              / (n_b - 1)),
         6) AS welch_dof
FROM s
"""


@register("agg_welch_ttest", oracle=_WELCH_ORACLE)
def q_agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on event value between the even/
    odd user cohorts, with the Welch–Satterthwaite degrees of freedom —
    the continuous-metric companion to agg_ab_ztest's proportion test.
    All six sufficient statistics (n, Σv, Σv²) accumulate as exact
    BIGINTs at 1e2 fixed point (Σv² envelope: v ≤ 2e2 ⇒ vf² ≤ 4e8 ⇒
    safe past 1e10 rows; 1e6-point quantization would overflow Σv² at
    ~2e5× this corpus — scale chosen for the 100 TB envelope, per the
    helpers.py doctrine); the t statistic and dof are each ONE double
    expression over those ints, written identically in both engines.

    Scale: a single partial-aggregating scan into one row — the
    cheapest possible distributed shape for any sufficient-statistic
    test; adding metrics or cohorts adds columns, not passes.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("vf"),
    )
    a = lambda c: F.col("cohort") == c  # noqa: E731
    s = v.agg(
        F.count(F.when(a(0), 1)).alias("n_a"),
        F.count(F.when(a(1), 1)).alias("n_b"),
        F.sum(F.when(a(0), F.col("vf"))).cast("bigint").alias("s1_a"),
        F.sum(F.when(a(1), F.col("vf"))).cast("bigint").alias("s1_b"),
        F.sum(F.when(a(0), F.col("vf") * F.col("vf"))).cast("bigint").alias("s2_a"),
        F.sum(F.when(a(1), F.col("vf") * F.col("vf"))).cast("bigint").alias("s2_b"),
    )
    mean = lambda s1, n: F.col(s1) / 100.0 / F.col(n)  # noqa: E731
    var_over_n = (
        lambda s1, s2, n: (
            (
                F.col(s2) / 10000.0
                - F.col(n) * mean(s1, n) * mean(s1, n)
            )
            / (F.col(n) - 1)
        )
        / F.col(n)
    )  # noqa: E731
    va, vb = var_over_n("s1_a", "s2_a", "n_a"), var_over_n("s1_b", "s2_b", "n_b")
    return s.select(
        "n_a",
        "n_b",
        F.round(mean("s1_a", "n_a"), 6).alias("mean_a"),
        F.round(mean("s1_b", "n_b"), 6).alias("mean_b"),
        F.round(
            (mean("s1_a", "n_a") - mean("s1_b", "n_b")) / F.sqrt(va + vb), 6
        ).alias("t_stat"),
        F.round(
            F.pow(va + vb, 2)
            / (
                F.pow(va, 2) / (F.col("n_a") - 1)
                + F.pow(vb, 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_dof"),
    )


# --- rank statistics via value-histogram reduction ---------------------------

# Shared doctrine for the two tests below: classic rank statistics are
# defined over a GLOBAL SORT of the pooled sample — a non-starter at
# 100 TB. Both reduce instead to the value HISTOGRAM (one hash agg on
# the 1e2-fixed-point value: ≤ ~20k rows bounded by the VALUE DOMAIN,
# not the corpus), from which rank sums and ECDFs follow by a cumulative
# window over that bounded frame. All accumulators are exact BIGINTs;
# the statistic is one double expression at the end.

_MWU_ORACLE = """
WITH v AS (
  SELECT user_id % 2 AS cohort,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
  FROM events
),
h AS (
  SELECT vf,
         CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS ca,
         CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS cb
  FROM v GROUP BY vf
),
c AS (
  SELECT vf, ca, cb, ca + cb AS ct,
         CAST(coalesce(SUM(ca + cb) OVER
              (ORDER BY vf ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS cum0
  FROM h
),
s AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(ca * (2 * cum0 + ct + 1)) AS BIGINT) AS r2_a,
         CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS ties
  FROM c
)
SELECT n_a, n_b,
       round((r2_a - n_a * (n_a + 1)) / 2.0, 6) AS u_a,
       round(((r2_a - n_a * (n_a + 1)) / 2.0 - n_a * n_b / 2.0)
             / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                    * ((n_a + n_b + 1)
                       - CAST(ties AS DOUBLE)
                         / ((n_a + n_b) * CAST(n_a + n_b - 1 AS DOUBLE)))),
             6) AS z_stat
FROM s
"""


@register("agg_mannwhitney_u", oracle=_MWU_ORACLE)
def q_agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the even/odd user
    cohorts with midrank tie handling and the tie-corrected normal
    approximation — the nonparametric companion to agg_welch_ttest.
    The doubled rank sum 2R_a = Σ c_a·(2·cum_before + t + 1) is exact
    BIGINT (midranks are half-integers, so doubling keeps integers);
    the tie term Σ(t³−t) is exact while the per-value tie count t stays
    under ~2×10⁶ (t³ < 2⁶³) — beyond that, aggregate t in 1e-k coarser
    value bins first.

    Scale: one hash agg events→histogram (partial agg does the heavy
    lifting map-side), one cumulative window over the ≤20k-row value
    domain (bounded-frame doctrine), one row out. No global sort of
    raw rows anywhere — the rank sums come from counts.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("vf"),
    )
    h = v.groupBy("vf").agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("ca"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("cb"),
    )
    wcum = Window.orderBy("vf").rowsBetween(Window.unboundedPreceding, -1)
    c = h.select(
        "vf",
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("ct"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(wcum), F.lit(0)
        ).cast("bigint").alias("cum0"),
    )
    s = c.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cum0") + F.col("ct") + 1))
        .cast("bigint")
        .alias("r2_a"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("bigint")
        .alias("ties"),
    )
    u_a = (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)) / 2.0
    n, na, nb = (
        F.col("n_a") + F.col("n_b"),
        F.col("n_a"),
        F.col("n_b"),
    )
    var = (na.cast("double") * nb / 12.0) * (
        (n + 1) - F.col("ties").cast("double") / (n * (n - 1).cast("double"))
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_a"),
        F.round((u_a - na * nb / 2.0) / F.sqrt(var), 6).alias("z_stat"),
    )


_KS_ORACLE = """
WITH v AS (
  SELECT user_id % 2 AS cohort,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
  FROM events
),
h AS (
  SELECT vf,
         CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS ca,
         CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS cb
  FROM v GROUP BY vf
),
c AS (
  SELECT vf,
         CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
  FROM h
  WINDOW w AS (ORDER BY vf ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
),
t AS (SELECT CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b
      FROM v),
d AS (
  SELECT CAST(MAX(ABS(cum_a * t.n_b - cum_b * t.n_a)) AS BIGINT) AS dmax
  FROM c, t
)
SELECT t.n_a, t.n_b,
       round(CAST(d.dmax AS DOUBLE) / (t.n_a * t.n_b), 6) AS ks_d,
       round((CAST(d.dmax AS DOUBLE) / (t.n_a * t.n_b))
             * sqrt(CAST(t.n_a AS DOUBLE) * t.n_b / (t.n_a + t.n_b)),
             6) AS ks_stat
FROM d, t
"""


@register("agg_ks_test", oracle=_KS_ORACLE)
def q_agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov: D = max |ECDF_a − ECDF_b| between
    the even/odd user cohorts, with the √(n_a·n_b/n) normalization —
    the distribution-drift detector (cf. emb_drift_monitor for the
    embedding-space analog). The ECDF gap is maximized as the exact
    INTEGER |cum_a·n_b − cum_b·n_a| (cross-multiplied to dodge float
    comparison at the argmax), and divided out once at the end.

    Scale: same value-histogram reduction as agg_mannwhitney_u — hash
    agg to the bounded value domain, one cumulative window there, one
    row out. The integer envelope is cum·n ≤ N² = 10¹² at sf0.1;
    beyond ~3×10⁹ rows, divide per-cohort first (two doubles) and
    accept ulp-level argmax ambiguity, or rescale counts.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("vf"),
    )
    h = v.groupBy("vf").agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("ca"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("cb"),
    )
    wcum = Window.orderBy("vf").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        F.sum("ca").over(wcum).cast("bigint").alias("cum_a"),
        F.sum("cb").over(wcum).cast("bigint").alias("cum_b"),
    )
    t = v.agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("n_b"),
    )
    d = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
                )
            )
            .cast("bigint")
            .alias("dmax")
        )
    )
    ks_d = F.col("dmax").cast("double") / (F.col("n_a") * F.col("n_b"))
    return d.crossJoin(F.broadcast(t)).select(
        "n_a",
        "n_b",
        F.round(ks_d, 6).alias("ks_d"),
        F.round(
            ks_d
            * F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b")
                / (F.col("n_a") + F.col("n_b"))
            ),
            6,
        ).alias("ks_stat"),
    )


# --- Spearman rank correlation -----------------------------------------------

_SPEARMAN_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS nx,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS vy
  FROM events GROUP BY date_trunc('day', ts)
),
r AS (
  SELECT
    2 * RANK() OVER (ORDER BY nx) + COUNT(*) OVER (PARTITION BY nx) - 1 AS dx,
    2 * RANK() OVER (ORDER BY vy) + COUNT(*) OVER (PARTITION BY vy) - 1 AS dy
  FROM daily
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM r
)
SELECT n,
       round((n * sxy - sx * sy)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
FROM s
"""


@register("agg_spearman_corr", oracle=_SPEARMAN_ORACLE)
def q_agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily event volume and daily
    value total, with proper midrank tie handling — the monotonic-
    association companion to agg_corr_powersum's Pearson. Doubled
    midranks (2·RANK + tie_count − 1) stay integers, so all six
    sufficient statistics are exact BIGINTs and ρ is one double
    expression — Pearson applied to ranks, which IS Spearman's
    definition.

    Scale: ranks live on the DAY-aggregated spine (≤366 rows/year, the
    bounded-frame doctrine) after the events shuffle collapses in the
    groupBy; for a data-proportional frame the ranks would come from
    helpers.dist_row_number plus a tie-count join instead — same
    downstream algebra.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("nx"),
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias("vy"),
    )
    def dmid(c: str):
        return (
            2 * F.rank().over(Window.orderBy(c))
            + F.count(F.lit(1)).over(Window.partitionBy(c))
            - 1
        ).cast("bigint")

    r = daily.select(dmid("nx").alias("dx"), dmid("vy").alias("dy"))
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select("n", F.round(num / den, 6).alias("spearman_rho"))


# --- technical indicators on the daily series --------------------------------

_BOLL_W = 20  # trailing window (days)

_BOLL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL})
SELECT day,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame,
       round(SUM(x) OVER w / 1000.0 / (COUNT(*) OVER w), 6) AS sma,
       round(sqrt(greatest(
           (SUM(x * x) OVER w) / 1000000.0 / (COUNT(*) OVER w)
           - (SUM(x) OVER w / 1000.0 / (COUNT(*) OVER w))
             * (SUM(x) OVER w / 1000.0 / (COUNT(*) OVER w)), 0.0)), 6)
           AS sigma,
       CAST(x > 0 AS BOOLEAN) AS valid
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN {_BOLL_W - 1} PRECEDING
                                   AND CURRENT ROW)
"""


@register("win_bollinger_bands", oracle=_BOLL_ORACLE)
def q_win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-style moving mean and population σ over a trailing
    {w}-day frame of the daily value series. Both moments derive from
    the SAME windowed integer power sums (Σx, Σx² as exact BIGINTs at
    1e3 fixed point), so mean and σ are each one double expression —
    no per-frame re-aggregation, no float accumulation hazard. The
    expanding head frames (< {w} days) report their true frame count.

    Scale: windowed sums over the day-aggregated spine (bounded-frame
    doctrine); the frame algebra is identical at minute/hour grain —
    swap the date_trunc unit, the power-sum trick is grain-free.
    """.format(w=_BOLL_W)
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_fx(ev)
    w = Window.orderBy("day").rowsBetween(-(_BOLL_W - 1), 0)
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum("x").over(w)
    s2 = F.sum(F.col("x") * F.col("x")).over(w)
    mean = s1 / 1000.0 / cnt
    var = F.greatest(s2 / 1000000.0 / cnt - mean * mean, F.lit(0.0))
    return daily.select(
        "day",
        cnt.cast("bigint").alias("n_in_frame"),
        F.round(mean, 6).alias("sma"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        (F.col("x") > 0).alias("valid"),
    )


_RSI_W = 14

_RSI_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
d AS (
  SELECT day,
         x - LAG(x) OVER (ORDER BY day) AS delta
  FROM daily
),
g AS (
  SELECT day,
         CAST(greatest(delta, 0) AS BIGINT) AS gain,
         CAST(greatest(-delta, 0) AS BIGINT) AS loss
  FROM d WHERE delta IS NOT NULL
)
SELECT day,
       round(CASE WHEN SUM(loss) OVER w = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + CAST(SUM(gain) OVER w AS DOUBLE)
                                              / (SUM(loss) OVER w))
             END, 6) AS rsi,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_deltas
FROM g
WINDOW w AS (ORDER BY day ROWS BETWEEN {_RSI_W - 1} PRECEDING
                                   AND CURRENT ROW)
"""


@register("win_rsi_indicator", oracle=_RSI_ORACLE)
def q_win_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index over a trailing {w}-delta frame (the
    frame-exact simple-average variant; Wilder's recursive smoothing is
    a recurrence — use the cumulative-window EWMA shape of
    agg_decay_weighted for that). Day-over-day deltas split into
    integer gain/loss streams; RS = Σgain/Σloss over the frame and
    RSI = 100 − 100/(1+RS), with the all-gain frame pinned to 100
    exactly. Every accumulator is an exact BIGINT.

    Scale: LAG + two windowed sums on the bounded day spine; one sort
    per partition of a ≤366-row frame.
    """.format(w=_RSI_W)
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_fx(ev)
    wl = Window.orderBy("day")
    d = daily.select(
        "day", (F.col("x") - F.lag("x").over(wl)).alias("delta")
    ).filter(F.col("delta").isNotNull())
    g = d.select(
        "day",
        F.greatest(F.col("delta"), F.lit(0)).cast("bigint").alias("gain"),
        F.greatest(-F.col("delta"), F.lit(0)).cast("bigint").alias("loss"),
    )
    w = Window.orderBy("day").rowsBetween(-(_RSI_W - 1), 0)
    sg, sl = F.sum("gain").over(w), F.sum("loss").over(w)
    rsi = F.when(sl == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + sg.cast("double") / sl)
    )
    return g.select(
        "day",
        F.round(rsi, 6).alias("rsi"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_deltas"),
    )


# --- linear-interpolation gap fill -------------------------------------------

_INTERP_ORACLE = """
WITH obs AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS vf
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1
  HAVING COUNT(*) >= 2
),
spine AS (
  SELECT user_id, CAST(unnest(range(0, CAST(d1 - d0 AS BIGINT) + 1)) AS BIGINT)
             AS off, d0
  FROM span
),
grid AS (
  SELECT s.user_id, s.d0 + CAST(s.off AS INTEGER) AS day
  FROM spine s
),
j AS (
  SELECT g.user_id, g.day, o.vf,
         last_value(o.vf IGNORE NULLS) OVER w_b AS pv,
         last_value(CASE WHEN o.vf IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER w_b AS pd,
         first_value(o.vf IGNORE NULLS) OVER w_f AS nv,
         first_value(CASE WHEN o.vf IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER w_f AS nd
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day
  WINDOW w_b AS (PARTITION BY g.user_id ORDER BY g.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_f AS (PARTITION BY g.user_id ORDER BY g.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(day AS TIMESTAMP) AS day,
       round(CASE WHEN vf IS NOT NULL THEN vf
                  ELSE pv + (nv - pv) * (day - pd) * 1.0
                            / (nd - pd)
             END / 1000.0, 6) AS value_interp,
       vf IS NULL AS is_interpolated
FROM j
"""


@register("win_gap_fill_interpolate", oracle=_INTERP_ORACLE)
def q_win_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill — the numeric sibling of
    win_forward_fill (LOCF) and agg_timeseries_densify (zero fill): on
    each user's purchase-day span, missing days take the straight line
    between the surrounding observations,
    v = v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev).
    Both neighbors come from one backward and one forward IGNORE NULLS
    ordered frame carrying (value, day) pairs; the interpolation is an
    exact integer expression until the single final division.

    Scale: per-user spine generation bounded by each user's own span
    (densify's doctrine), two ordered frames per user partition, no
    self-joins — gap filling stays linear in output rows at any
    corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias(
                "vf"
            )
        )
    )
    span = (
        obs.groupBy("user_id")
        .agg(
            F.min("day").alias("d0"),
            F.max("day").alias("d1"),
            F.count(F.lit(1)).alias("nobs"),
        )
        .filter(F.col("nobs") >= 2)
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = grid.join(obs, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("vf").isNotNull(), F.col("day"))
    withn = j.select(
        "user_id",
        "day",
        "vf",
        F.last("vf", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("vf", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    num_days = F.datediff(F.col("day"), F.col("pd")).cast("bigint")
    den_days = F.datediff(F.col("nd"), F.col("pd")).cast("bigint")
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * num_days * 1.0 / den_days
    return withn.select(
        "user_id",
        "day",
        F.round(
            F.when(F.col("vf").isNotNull(), F.col("vf").cast("double"))
            .otherwise(interp)
            / 1000.0,
            6,
        ).alias("value_interp"),
        F.col("vf").isNull().alias("is_interpolated"),
    )


# --- exact percentiles from the value histogram ------------------------------

_PCTL_HIST_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY vf) / 100.0, 6) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY vf) / 100.0, 6) AS p90,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY vf) / 100.0, 6) AS p99
FROM v GROUP BY event_type
"""


@register("agg_percentile_histogram", oracle=_PCTL_HIST_ORACLE)
def q_agg_percentile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_CONT from the value HISTOGRAM — the
    100 TB-shaped order statistic: where agg_percentile_cont buffers
    every value into Spark's exact percentile aggregate (per-group
    memory ∝ rows), this derives the identical interpolated
    percentiles from cumulative counts over the fixed-point value
    domain (state ∝ distinct values, mergeable like any histogram).
    For each p, rank r = (n−1)·p; the values at 0-indexed positions
    ⌊r⌋ and ⌈r⌉ are the histogram rows whose [cum, cum+c) span covers
    them, and the interpolation v_lo + (r−⌊r⌋)(v_hi−v_lo) matches the
    definitional PERCENTILE_CONT the oracle runs on raw values — the
    hash match PROVES the histogram derivation equivalent.

    Scale: one hash agg to (group, value) cells with map-side combine,
    one cumulative window over each group's bounded value domain, one
    conditional-agg pass — no per-group value buffering anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("vf"),
    )
    h = v.groupBy("event_type", "vf").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vf")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    hh = h.select(
        "event_type",
        "vf",
        "c",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("cum0"),
        F.sum("c").over(wall).alias("n"),
    )
    cols = [F.max("n").cast("bigint").alias("n")]
    outs = []
    for name, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        r = (F.col("n") - 1).cast("double") * F.lit(p)
        k_lo = F.floor(r).cast("bigint")
        k_hi = F.ceil(r).cast("bigint")
        covers = lambda k: (F.col("cum0") <= k) & (k < F.col("cum0") + F.col("c"))  # noqa: E731
        cols.append(
            F.max(F.when(covers(k_lo), F.col("vf"))).alias(f"_{name}_lo")
        )
        cols.append(
            F.max(F.when(covers(k_hi), F.col("vf"))).alias(f"_{name}_hi")
        )
        cols.append(F.max(r).alias(f"_{name}_r"))
        frac = F.col(f"_{name}_r") - F.floor(F.col(f"_{name}_r"))
        outs.append(
            F.round(
                (
                    F.col(f"_{name}_lo")
                    + frac * (F.col(f"_{name}_hi") - F.col(f"_{name}_lo"))
                )
                / 100.0,
                6,
            ).alias(name)
        )
    g = hh.groupBy("event_type").agg(*cols)
    return g.select("event_type", "n", *outs)


# --- sample-ratio-mismatch guard ---------------------------------------------

_SRM_ORACLE = """
WITH u AS (
  SELECT user_id, user_id % 2 AS cohort FROM events GROUP BY 1, 2
),
s AS (
  SELECT CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b
  FROM u
)
SELECT n_a, n_b,
       round(((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0))
             / ((n_a + n_b) / 2.0)
           + ((n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0))
             / ((n_a + n_b) / 2.0), 6) AS chi2,
       ((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0))
             / ((n_a + n_b) / 2.0)
           + ((n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0))
             / ((n_a + n_b) / 2.0) > 10.828 AS srm_alarm
FROM s
"""


@register("agg_srm_guard", oracle=_SRM_ORACLE)
def q_agg_srm_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch guard — the first gate every experiment
    readout must pass before agg_ab_ztest's effect estimate means
    anything: a 1-dof chi-square of the observed cohort split against
    the designed 50/50, alarming at the p < 0.001 critical value
    (10.828). An SRM alarm means assignment or logging is broken and
    the experiment is invalid regardless of its lift. Exact integer
    counts; the statistic is one double expression.

    Scale: the same shrinking two-shuffle shape as the z-test — per-
    user reduction then two global counters. Checking more designed
    ratios (90/10 holdouts, multi-arm) changes constants, not passes.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", (F.col("user_id") % 2).alias("cohort")).distinct()
    s = u.agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("n_b"),
    )
    exp = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (F.col("n_a") - exp) * (F.col("n_a") - exp) / exp + (
        F.col("n_b") - exp
    ) * (F.col("n_b") - exp) / exp
    return s.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 10.828).alias("srm_alarm"),
    )


# --- decile lift / gains table -----------------------------------------------

_LIFT_ORACLE = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         doc_id
  FROM documents
),
ranked AS (
  SELECT pos,
         NTILE(10) OVER (ORDER BY score DESC, doc_id) AS decile
  FROM scored
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS total_pos,
         CAST(COUNT(*) AS BIGINT) AS total_n
  FROM ranked
),
d AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile
),
c AS (
  SELECT decile, n, n_pos,
         CAST(SUM(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_pos,
         CAST(SUM(n) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_n
  FROM d
)
SELECT c.decile, c.n, c.n_pos,
       round(CAST(c.cum_pos AS DOUBLE) / tot.total_pos, 6) AS cum_capture,
       round((CAST(c.cum_pos AS DOUBLE) / c.cum_n)
             / (CAST(tot.total_pos AS DOUBLE) / tot.total_n), 6) AS cum_lift
FROM c, tot
"""


@register("ml_decile_lift", oracle=_LIFT_ORACLE)
def q_ml_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table — the campaign-targeting readout next
    to ml_auc_exact: rank the population by score (document length as
    the lang='en' scorer, deterministic doc_id tie-break), cut into
    NTILE(10) deciles via the exact ntile identity over
    helpers.dist_row_number (never an un-partitioned window), and
    report per decile the positives, cumulative capture rate, and
    cumulative lift over the base rate. A useful scorer shows top-decile
    lift > 1 and capture concentating early; the bottom decile's
    cum_lift is exactly 1 by construction.

    Scale: the distributed rank is the only ordered pass (range-
    partitioned two-phase); everything after is a 10-row frame.
    """
    from random_forest_using_hadoop_spark.helpers import (
        dist_row_number,
        ntile_from_rn,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("pos"),
        "doc_id",
    )
    n_tot = d.count()
    ranked = dist_row_number(
        d, [F.col("score").desc(), F.col("doc_id")], out="rn"
    ).select("pos", ntile_from_rn("rn", n_tot, 10).alias("decile"))
    dd = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = dd.agg(
        F.sum("n_pos").cast("bigint").alias("total_pos"),
        F.sum("n").cast("bigint").alias("total_n"),
    )
    c = dd.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n_pos").over(wcum).cast("bigint").alias("cum_pos"),
        F.sum("n").over(wcum).cast("bigint").alias("cum_n"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "n_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("total_pos"), 6).alias(
            "cum_capture"
        ),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_n"))
            / (F.col("total_pos").cast("double") / F.col("total_n")),
            6,
        ).alias("cum_lift"),
    )
