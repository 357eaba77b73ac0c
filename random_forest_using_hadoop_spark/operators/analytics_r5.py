"""Round-5 analytics extensions: exact interpolated percentiles, CUSUM
changepoint detection, series autocorrelation, first-touch attribution,
partitioned-layout file auditing, and hashing-trick features.

Same doctrine as every other module: exact integer accumulation wherever
floats would cross an accumulation-order boundary; every rank carries a
deterministic tie-break; every scale claim is in the docstring and the
expensive ones are pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- exact interpolated percentiles ------------------------------------------

_PCTL_CONT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


@register("agg_percentile_cont", oracle=_PCTL_CONT_ORACLE)
def q_agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linearly-interpolated percentiles (p50/p90/p99) of event
    value per type — the continuous companion to [[agg_percentile_disc]]
    (SQL PERCENTILE_CONT semantics: rank (n-1)·p, interpolate between
    the two straddling values).

    Scale: Spark's exact `percentile` is a two-phase aggregate — each
    task accumulates its partition's values, the merge happens on the
    reduce side per group — so parallelism is |event_type| groups at the
    final step, like every exact-order statistic. For percentile needs
    on billions of rows per group, [[agg_sketch_rollup]] is the
    approximate scale path; this operator is the ground truth that
    audits it. Interpolation is one double op on two exact inputs, so
    cross-engine agreement survives the round(…, 6).
    """
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.element_at(pct, 1), 6).alias("p50"),
        F.round(F.element_at(pct, 2), 6).alias("p90"),
        F.round(F.element_at(pct, 3), 6).alias("p99"),
    )


# --- CUSUM changepoint -------------------------------------------------------

# Exact-integer CUSUM: with daily fixed-point totals x_i and their sum T
# over n days, the scaled cumulative deviation S_i = n·Σ_{j≤i} x_j − i·T
# is an exact BIGINT (≈ 30 × 30 × 2e11 ≈ 2e14 at sf0.1 — far inside
# int64), so the argmax is a deterministic integer comparison, never a
# float-accumulation coin flip.
_CUSUM_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS x
  FROM events GROUP BY date_trunc('day', ts)
),
c AS (
  SELECT day, x,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(x) OVER () AS BIGINT) AS t,
         CAST(SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
  FROM daily
)
SELECT day AS change_day,
       round(abs(n * cum - i * t) / (CAST(n AS DOUBLE) * 1000000.0), 6)
           AS cusum_abs,
       CAST(n AS BIGINT) AS n_days
FROM c
ORDER BY abs(n * cum - i * t) DESC, day
LIMIT 1
"""


@register("agg_changepoint_cusum", oracle=_CUSUM_ORACLE)
def q_agg_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily value series: the day
    where the cumulative deviation from the series mean peaks — the
    classic "when did the level shift?" screen behind metric-regression
    alerts (Page 1954's cumulative-sum chart, offline form).

    Scale: the stream reduces to one row per day before any window
    runs, so every window here operates on a calendar-bounded frame
    (~365 rows/year regardless of event volume) — an un-partitioned
    window over THAT frame is safe by construction, unlike one over a
    data-proportional frame (contrast [[agg_pareto_point]], which needs
    the sliced two-pass). The argmax compares exact integers with a
    date tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")
        ).alias("x")
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.select(
        "day",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("t"),
        F.sum("x").over(wcum).alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("i"),
    )
    s = F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("t"))
    return (
        c.orderBy(s.desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.round(
                s / (F.col("n").cast("double") * 1000000.0), 6
            ).alias("cusum_abs"),
            F.col("n").cast("bigint").alias("n_days"),
        )
    )


# --- lagged autocorrelation --------------------------------------------------

# x is quantized at 1e3 (not 1e6) so the Σx·y power sums stay inside
# int64: daily totals ≈ 2e7 at 1e3 quantization → x·y ≈ 4e14, × 365
# days ≈ 1.5e17 < 9.2e18. All five sums are exact; the Pearson ratio is
# double math on six exact values per lag.
_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY date_trunc('day', ts)
),
lags AS (SELECT unnest(range(1, 8)) AS lag),
pairs AS (
  SELECT l.lag, a.x AS x, b.x AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INTEGER))
),
s AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       round((n * sxy - sx * sy)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS autocorr
FROM s
"""


@register("agg_autocorr", oracle=_AUTOCORR_ORACLE)
def q_agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily value series at lags 1–7 — the
    seasonality probe ("is there a weekly cycle?") behind forecast
    model selection. Pearson r between the series and its k-day-shifted
    self, from exact integer power sums.

    The shifted pairing is a calendar equi-join on ``day + k days``
    (gap-proof, like [[win_period_over_period]]), never a row-offset
    LAG. Scale: the stream reduces to one row per day first; the
    7-lag × |days| pair frame is calendar-bounded, and the lag spine is
    a broadcast 7-row build side.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias("x")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        (F.col("day") + F.make_dt_interval(F.col("lag"))).alias("day"),
        F.col("x").alias("y"),
    )
    pairs = daily.join(shifted, "day").select("lag", "x", "y")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("autocorr"),
    )


# --- first-touch attribution -------------------------------------------------

_ATTRIB_WINDOW_DAYS = 7

_ATTRIB_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT p.event_id,
         e.event_type,
         ROW_NUMBER() OVER (
             PARTITION BY p.event_id ORDER BY e.ts, e.event_id
         ) AS rn
  FROM p JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >= p.ts - INTERVAL {_ATTRIB_WINDOW_DAYS} DAY
   AND e.ts <= p.ts
),
conv AS (
  SELECT event_type AS first_touch_type, CAST(COUNT(*) AS BIGINT)
             AS n_conversions
  FROM touches WHERE rn = 1 GROUP BY event_type
)
SELECT first_touch_type, n_conversions,
       round(n_conversions / CAST(SUM(n_conversions) OVER () AS DOUBLE), 6)
           AS share
FROM conv
"""


@register("win_attribution_touch", oracle=_ATTRIB_ORACLE)
def q_win_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: for every purchase, find the user's
    earliest event inside the preceding 7-day window and credit the
    conversion to that event's type — the marketing-attribution query
    every growth dashboard starts from. Deterministic first-touch pick
    via (ts, event_id) ordering.

    Scale: purchases join the event stream on user_id (hash equi-join;
    the time window is a residual predicate), so shuffle is keyed by
    user and each join group is one user's 7-day activity — bounded by
    per-user event rate, not corpus size. The first-touch pick is a
    per-purchase window over that same join frame; no global ordering
    anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = p.join(
        ev.select("user_id", "ts", "event_id", "event_type"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTRIB_WINDOW_DAYS} DAYS"))
        & (F.col("ts") <= F.col("p_ts")),
    )
    w = Window.partitionBy("p_id").orderBy("ts", "event_id")
    first = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("first_touch_type"))
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )
    tot = first.agg(F.sum("n_conversions").alias("tot"))
    return first.crossJoin(F.broadcast(tot)).select(
        "first_touch_type",
        "n_conversions",
        F.round(
            F.col("n_conversions") / F.col("tot").cast("double"), 6
        ).alias("share"),
    )


# --- snapshot / time-travel table layer --------------------------------------

_SNAPSHOT_CUT = "1995-01-01"

_SNAPSHOT_ORACLE = f"""
SELECT 1 AS version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1000000.0 AS sum_price
FROM orders WHERE o_orderdate < DATE '{_SNAPSHOT_CUT}'
UNION ALL
SELECT 2 AS version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1000000.0 AS sum_price
FROM orders
"""


@register("sink_snapshot_timetravel", oracle=_SNAPSHOT_ORACLE)
def q_sink_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal snapshot/time-travel table layer over plain parquet — the
    Iceberg/Delta primitive stripped to its core: every commit writes
    immutable data files plus a MANIFEST (a JSON list of the files
    visible in that version), and a versioned read plans ONLY the
    manifest's files. v1 = orders before {cut}; v2 = v1 plus an
    appended batch. The query reads BOTH versions back through their
    manifests and audits rows + total price per version — proving the
    v2 append is invisible to a v1 (time-travel) read.

    Scale: this is exactly how lake formats make 100 TB tables
    versionable — appends never rewrite data, readers pin a manifest,
    and the file listing is metadata (bounded driver-side JSON, here a
    few entries; real formats shard manifests once file counts reach
    millions). The versioned read passes explicit file paths to the
    parquet source, so pruning/pushdown work exactly as on a plain
    scan.
    """
    import json
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    o = load_table(spark, sf_dir, "orders")
    root = _tmp(sf_dir, "snapshot_tt")
    data_dir = os.path.join(root, "data")

    def _data_files() -> list[str]:
        return sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )

    # commit v1: base snapshot (overwrite wipes any previous staging)
    o.filter(F.col("o_orderdate") < F.lit(_SNAPSHOT_CUT).cast("date")).write.mode(
        "overwrite"
    ).parquet(data_dir)
    v1_files = _data_files()
    # commit v2: APPEND-only — v1's files are never touched
    o.filter(
        F.col("o_orderdate") >= F.lit(_SNAPSHOT_CUT).cast("date")
    ).write.mode("append").parquet(data_dir)
    v2_files = _data_files()
    os.makedirs(root, exist_ok=True)
    for ver, files in ((1, v1_files), (2, v2_files)):
        with open(os.path.join(root, f"manifest_v{ver}.json"), "w") as fh:
            json.dump({"version": ver, "files": files}, fh)

    def _read_version(ver: int) -> DataFrame:
        with open(os.path.join(root, f"manifest_v{ver}.json")) as fh:
            manifest = json.load(fh)
        return (
            spark.read.parquet(*manifest["files"])
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (
                    F.sum(
                        F.floor(
                            F.col("o_totalprice") * 1000000.0 + 0.5
                        ).cast("bigint")
                    )
                    / 1000000.0
                ).alias("sum_price"),
            )
            .select(F.lit(ver).alias("version"), "n_rows", "sum_price")
        )

    return _read_version(1).unionByName(_read_version(2))


# --- partitioned-layout file audit -------------------------------------------

_FILE_AUDIT_ORACLE = """
SELECT l_returnflag,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1000000.0 AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("scan_file_audit", oracle=_FILE_AUDIT_ORACLE)
def q_scan_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit of a hive-partitioned write: stage lineitem
    partitioned by l_returnflag (repartitioned so each value lands in
    exactly one file), read it back, and report per partition value the
    FILE count (via input_file_name), row count, and quantity total —
    the small-files / partition-skew health check every 100 TB table
    needs before its file counts rot query planning.

    Scale: input_file_name is a per-row virtual column evaluated at the
    scan (no extra IO); the audit is one hash agg over (value, file).
    The repartition-before-partitionBy pattern is itself the scale
    lesson: without it, every task writes a file per value and a
    1000-task stage times 3 values is 3000 files — this audit is the
    query that catches that.
    """
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    path = _tmp(sf_dir, "file_audit")
    (
        li.repartition("l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.select(
            F.col("l_returnflag").cast("string").alias("l_returnflag"),
            F.input_file_name().alias("file"),
            "l_quantity",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("file").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(
                    F.floor(F.col("l_quantity") * 1000000.0 + 0.5).cast(
                        "bigint"
                    )
                )
                / 1000000.0
            ).alias("sum_qty"),
        )
    )


# --- hashing-trick feature buckets -------------------------------------------

_N_HASH_BUCKETS = 64

# Portable token→bucket hash: the first two hex digits of md5(token),
# decoded via position-in-'0123456789abcdef' (both engines 1-index and
# return 0 on miss, and md5 emits lowercase hex in both), modulo the
# bucket count. Engine-native hash() differs between Spark (murmur3/42)
# and DuckDB, so the portable digest is the only cross-checkable choice.
_FEATURE_HASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
b AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
         % {_N_HASH_BUCKETS} AS bucket
  FROM tok WHERE tok <> ''
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM b GROUP BY bucket
"""


@register("ml_feature_hash", oracle=_FEATURE_HASH_ORACLE)
def q_ml_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al., ICML'09): map
    every token into a fixed {buckets}-bucket feature space by digest,
    with per-bucket document frequency and occurrence counts — the
    vocabulary-free feature path that feeds [[ml_assemble]] when the
    token space is unbounded (no dictionary build, no OOV).

    Scale: stateless JVM string math (split/md5/substr) on the scan,
    then one hash agg over {buckets} buckets — the map side combines to
    ≤ buckets rows per task before the shuffle. The distinct-doc count
    shuffles (bucket, doc_id) pairs; swap in approx_count_distinct for
    the sketch path if doc cardinality per bucket explodes.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hexpos = lambda i: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("tok"), i, 1)) - 1
    )
    b = tok.select(
        "doc_id",
        ((hexpos(1) * 16 + hexpos(2)) % _N_HASH_BUCKETS)
        .cast("bigint")
        .alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
