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
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
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
    # exact wide-integer Pearson algebra: the daily x sums reach ~1e11
    # at sf0.1, so sx·sx ≈ 1e22 overflows BIGINT (ANSI crash, caught by
    # the r9 full-registry scale scan — the same count()-pruning hole
    # as agg_skew_kurtosis hid it from the smoke tier). Spark widens to
    # DECIMAL(38,0), the oracle to HUGEINT — identical exact integers,
    # cast to double only at the final division.
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
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

_SNAPSHOT_CUT = "1997-01-01"  # mid-range: both commits are non-empty

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


# --- PMI collocations --------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 20

# PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p(bigram) over total bigrams
# and p(word) over total tokens. All counts are exact integers; the PMI
# itself is a handful of double ops on them, and the top-20 cut orders
# by the ROUNDED pmi with a (w1, w2) tie-break so the ranking never
# hinges on sub-1e-6 float residue.
_PMI_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS w,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM t
),
big AS (
  SELECT a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.w <> '' AND b.w <> ''
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE w <> '' GROUP BY w
),
bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big GROUP BY w1, w2
),
tot AS (
  SELECT CAST((SELECT COUNT(*) FROM big) AS BIGINT) AS n_big,
         CAST((SELECT SUM(c) FROM uni) AS BIGINT) AS n_tok
)
SELECT w1, w2, c_ab,
       round(ln((CAST(c_ab AS DOUBLE) / n_big)
                / ((CAST(ua.c AS DOUBLE) / n_tok)
                   * (CAST(ub.c AS DOUBLE) / n_tok))), 6) AS pmi
FROM bc JOIN uni ua ON ua.w = bc.w1
        JOIN uni ub ON ub.w = bc.w2
        CROSS JOIN tot
WHERE c_ab >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP}
"""


@register("text_pmi_collocations", oracle=_PMI_ORACLE)
def q_text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information (Church & Hanks
    1990): bigrams whose observed frequency most exceeds what their
    parts predict — the phrase detector ("new york", "machine
    learning") that feeds tokenizer merge rules and phrase-aware
    dedup shingling.

    Scale: bigrams come from a positional self-join keyed on
    (doc_id, pos) — shuffle ∝ tokens, never tokens². Unigram and
    bigram counts are separate hash aggs; the two totals join back as
    a broadcast scalar; the final cut is TakeOrderedAndProject over
    the ≥{min}-count survivors.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    big = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .filter((F.col("a.w") != "") & (F.col("b.w") != ""))
        .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
    )
    uni = (
        tok.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = bc.agg(F.sum("c_ab").alias("n_big")).crossJoin(
        uni.agg(F.sum("c").alias("n_tok"))
    )
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") / F.col("n_big"))
            / (
                (F.col("ua.c").cast("double") / F.col("n_tok"))
                * (F.col("ub.c").cast("double") / F.col("n_tok"))
            )
        ),
        6,
    )
    return (
        bc.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(uni.alias("ua")), F.col("ua.w") == F.col("w1"))
        .join(F.broadcast(uni.alias("ub")), F.col("ub.w") == F.col("w2"))
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(_PMI_TOP)
    )


# --- readability scoring -----------------------------------------------------

_READABILITY_ORACLE = """
WITH d AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS syllables
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(sentences) AS BIGINT) AS sentences,
       CAST(SUM(syllables) AS BIGINT) AS syllables,
       round(206.835
             - 1.015 * (CAST(SUM(words) AS DOUBLE) / SUM(sentences))
             - 84.6 * (CAST(SUM(syllables) AS DOUBLE) / SUM(words)), 6)
           AS flesch
FROM d GROUP BY source
"""


@register("text_readability", oracle=_READABILITY_ORACLE)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source (Flesch 1948), with the standard
    corpus-level proxies: whitespace words, [.!?]-run sentences, and
    vowel-group syllables — the readability gate training-data curation
    uses to separate prose from boilerplate/code soup.

    Scale: three stateless regexp counts on the scan, then one hash agg
    per source over exact integer totals; the Flesch formula runs once
    per group on two exact ratios. Pure codegen, zero Python.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.size(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).cast("bigint").alias("words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
            F.lit(1),
        ).cast("bigint").alias("sentences"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).cast("bigint").alias("syllables"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("sentences").alias("sentences"),
        F.sum("syllables").alias("syllables"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("words").cast("double") / F.col("sentences"))
            - 84.6 * (F.col("syllables").cast("double") / F.col("words")),
            6,
        ).alias("flesch"),
    )


# --- character-entropy gibberish screen --------------------------------------

# Per-character-class terms c·log2(c) are quantized to 1e6 fixed point
# BEFORE the sum, so the per-doc accumulation is exact integer math in
# both engines (a raw double Σ over ~80 distinct chars would be
# accumulation-order dependent). entropy = log2(n) − S/(n·1e6).
_CHAR_ENTROPY_ORACLE = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
cc AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM ch GROUP BY doc_id, ch
),
s AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(c * log2(CAST(c AS DOUBLE)) * 1000000.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS term_fx,
         CAST(COUNT(*) AS BIGINT) AS alphabet
  FROM cc GROUP BY doc_id
)
SELECT doc_id, n AS n_chars, alphabet,
       round(log2(CAST(n AS DOUBLE))
             - term_fx / (CAST(n AS DOUBLE) * 1000000.0), 6) + 0.0
         AS entropy_bits
FROM s
"""


@register("text_char_entropy", oracle=_CHAR_ENTROPY_ORACLE)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    base64-blob / key-dump screen: natural prose sits ~4–4.5 bits,
    uniform random base64 ≈ 6, single-char spam ≈ 0. Alphabet size
    rides along as the secondary signal.

    Scale: explode ∝ characters but collapses immediately to
    (doc, char-class) counts (≤ alphabet rows per doc) in a map-side-
    combining hash agg; the entropy reduction is a second tiny agg.
    The c·log2(c) terms are fixed-point-quantized before summation so
    the result is accumulation-order-proof (see module doctrine).
    """
    d = load_table(spark, sf_dir, "documents")
    cc = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term_fx = F.floor(
        F.col("c") * F.log2(F.col("c").cast("double")) * 1000000.0 + 0.5
    ).cast("bigint")
    s = cc.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(term_fx).alias("term_fx"),
        F.count(F.lit(1)).alias("alphabet"),
    )
    return s.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        "alphabet",
        # + 0.0 normalizes IEEE negative zero: a single-character doc
        # has entropy 0 up to the fixed-point remainder (±1e-9), and
        # the two engines' round() keep OPPOSITE zero signs — repr'd
        # '0.0' vs '-0.0' by the dtype-sensitive hash (found by
        # tests/test_fuzz_parity.py's periodic corpus; -0.0 + 0.0 is
        # +0.0 exactly, every other value is unchanged)
        (
            F.round(
                F.log2(F.col("n").cast("double"))
                - F.col("term_fx") / (F.col("n").cast("double") * 1000000.0),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy_bits"),
    )


# --- LSH banding audit (portable MinHash) ------------------------------------

_AUDIT_SALTS = 8       # 8 hash functions = 4 bands x 2 rows
_AUDIT_BANDS = 4
_AUDIT_T = 0.6

# Portable MinHash: signature_k(doc) = lexicographic MIN over the doc's
# shingles of md5(k || ':' || shingle) — pure digest math, so Spark and
# DuckDB compute IDENTICAL signatures (contrast dedup_minhash, whose
# MLlib signatures are engine-internal and auditable only through the
# recall argument). Band key = concat of the band's two signatures.
_LSH_AUDIT_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                       i -> text[i : i + 4])) AS shingles
  FROM documents
),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
tok AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT inter.a, inter.b
  FROM inter
  JOIN sz sa ON sa.doc_id = inter.a
  JOIN sz sb ON sb.doc_id = inter.b
  WHERE i * 1.0 / (sa.n + sb.n - i) >= {_AUDIT_T}
),
sig AS (
  SELECT doc_id, salt, MIN(md5(salt || ':' || s)) AS sig
  FROM tok CROSS JOIN (SELECT unnest(range({_AUDIT_SALTS})) AS salt)
  GROUP BY doc_id, salt
),
bandkey AS (
  SELECT doc_id, salt // 2 AS band,
         MAX(CASE WHEN salt % 2 = 0 THEN sig END)
         || MAX(CASE WHEN salt % 2 = 1 THEN sig END) AS bkey
  FROM sig GROUP BY doc_id, salt // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bandkey a JOIN bandkey b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
hits AS (
  SELECT c.a, c.b FROM cand c JOIN truth t ON t.a = c.a AND t.b = c.b
)
SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
       round((SELECT COUNT(*) FROM hits)
             / greatest(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 1.0), 6)
           AS precision,
       round((SELECT COUNT(*) FROM hits)
             / greatest(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 1.0), 6)
           AS recall
"""


@register("dedup_lsh_audit", oracle=_LSH_AUDIT_ORACLE)
def q_dedup_lsh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit of MinHash-LSH banding quality: build PORTABLE
    digest-based MinHash signatures ({salts} hashes = {bands} bands × 2
    rows), generate band-collision candidates, and score them against
    the exact-Jaccard(≥{t}) truth set — one row of candidate count,
    truth count, hits, precision, recall. This is the tuning loop for
    every banded dedup in the engine ([[dedup_minhash]],
    [[dedup_simhash]]): it turns "we think 4×2 banding is enough" into
    measured precision/recall.

    Scale (truth side rebuilt r9): signatures and candidates are the
    REAL LSH path (hash agg + band equi-join, shuffle ∝ collisions).
    The truth side is by DEFINITION all-pairs (an exact audit may not
    take its truth from any banding, including the one it audits —
    circular truth hides exactly the misses it exists to count); the r5
    form computed it as a shared-shingle inverted-index join, which on
    this closed 2,041-shingle vocabulary generates Σdf² ≈ 8×10⁸
    co-occurrence rows at sf0.1 (21.3 s, scaling probe). It now runs as
    block-pair bitmap popcounts: docs encode to packed-long shingle
    bitmaps (shared _bitmap_encode), every unordered pair meets in
    exactly one of T(T+1)/2 groups (the dedup_embedding grouping), and
    one numpy byte-LUT popcount per group scores all its pairs — same
    exact J, no co-occurrence blow-up, work n²·W/2 evenly spread. At
    100 TB the audit still runs over a bounded hash-sampled slice
    (exactly like [[sample_hash_stratified]]) — exactness over the
    sample is the point, not corpus-wide all-pairs.
    """
    import numpy as np
    import pandas as pd

    from random_forest_using_hadoop_spark.operators.dedup_lsh import (
        _bitmap_encode,
        _docs_with_shingles,
    )

    d = _docs_with_shingles(spark, sf_dir)
    tok = d.select("doc_id", F.explode("shingles").alias("s"))
    enc, _n_words = _bitmap_encode(d.select("doc_id", "shingles"), "shingles")
    blocks = 8
    t = _AUDIT_T
    tagged = (
        enc.withColumn("blk", F.pmod("doc_id", F.lit(blocks)).cast("int"))
        .select(
            "doc_id",
            "n",
            "bm",
            "blk",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {blocks - 1}), k ->"
                    " struct(least(blk, k) as gi, greatest(blk, k) as gj))"
                )
            ).alias("g"),
        )
        .select("doc_id", "n", "bm", "blk", "g.gi", "g.gj")
    )

    def truth_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pop8 = np.array([bin(x).count("1") for x in range(256)], dtype=np.int64)

        def inter_matrix(A, B):
            out = np.zeros((len(A), len(B)), dtype=np.int64)
            for w in range(A.shape[1]):
                x = A[:, w][:, None] & B[None, :, w]
                out += pop8[x.view(np.uint8).reshape(len(A), len(B), 8)].sum(
                    axis=2
                )
            return out

        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        ids = pdf["doc_id"].to_numpy()
        ns = pdf["n"].to_numpy()
        mat = np.asarray(pdf["bm"].tolist(), dtype=np.int64)
        if gi == gj:
            inter = inter_matrix(mat, mat)
            ia, jb = np.triu_indices(len(ids), k=1)
        else:
            blk = pdf["blk"].to_numpy()
            a_idx = np.where(blk == gi)[0]
            b_idx = np.where(blk == gj)[0]
            inter = np.zeros((len(ids), len(ids)), dtype=np.int64)
            if len(a_idx) and len(b_idx):
                inter[np.ix_(a_idx, b_idx)] = inter_matrix(
                    mat[a_idx], mat[b_idx]
                )
            ia, jb = np.meshgrid(a_idx, b_idx, indexing="ij")
            ia, jb = ia.ravel(), jb.ravel()
        i = inter[ia, jb]
        # same IEEE double division the oracle's i*1.0/(na+nb-i) runs
        keep = i / (ns[ia] + ns[jb] - i).astype(np.float64) >= t
        ia, jb = ia[keep], jb[keep]
        return pd.DataFrame(
            {
                "a": np.minimum(ids[ia], ids[jb]),
                "b": np.maximum(ids[ia], ids[jb]),
            }
        )

    truth = tagged.groupBy("gi", "gj").applyInPandas(
        truth_pairs, schema="a long, b long"
    )
    salts = spark.range(_AUDIT_SALTS).select(
        F.col("id").cast("int").alias("salt")
    )
    sig = (
        tok.crossJoin(F.broadcast(salts))
        .groupBy("doc_id", "salt")
        .agg(
            F.min(
                F.md5(F.concat(F.col("salt").cast("string"), F.lit(":"), "s"))
            ).alias("sig")
        )
    )
    bandkey = sig.groupBy(
        "doc_id", (F.col("salt") / 2).cast("int").alias("band")
    ).agg(
        F.concat(
            F.max(F.when(F.col("salt") % 2 == 0, F.col("sig"))),
            F.max(F.when(F.col("salt") % 2 == 1, F.col("sig"))),
        ).alias("bkey")
    )
    cand = (
        bandkey.alias("x")
        .join(
            bandkey.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    hits = cand.join(truth, ["a", "b"])
    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_pairs")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
    )
    return counts.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        F.round(
            F.col("n_hits")
            / F.greatest(F.col("n_candidates").cast("double"), F.lit(1.0)),
            6,
        ).alias("precision"),
        F.round(
            F.col("n_hits")
            / F.greatest(F.col("n_true_pairs").cast("double"), F.lit(1.0)),
            6,
        ).alias("recall"),
    )


# --- matryoshka truncation recall --------------------------------------------

_MATRYOSHKA_DIMS = 16

_MATRYOSHKA_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
fullp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round(list_inner_product(q.ve, c.ve)
               / (sqrt(list_inner_product(q.ve, q.ve))
                  * sqrt(list_inner_product(c.ve, c.ve))), 6) AS cos_sim
  FROM v q JOIN v c ON c.vec_id >= 5
  WHERE q.vec_id < 5
),
truncp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round(list_inner_product(list_slice(q.ve, 1, {_MATRYOSHKA_DIMS}),
                                  list_slice(c.ve, 1, {_MATRYOSHKA_DIMS}))
               / (sqrt(list_inner_product(list_slice(q.ve, 1, {_MATRYOSHKA_DIMS}),
                                          list_slice(q.ve, 1, {_MATRYOSHKA_DIMS})))
                  * sqrt(list_inner_product(list_slice(c.ve, 1, {_MATRYOSHKA_DIMS}),
                                            list_slice(c.ve, 1, {_MATRYOSHKA_DIMS})))),
               6) AS cos_sim
  FROM v q JOIN v c ON c.vec_id >= 5
  WHERE q.vec_id < 5
),
fr AS (
  SELECT query_id, corpus_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id) AS rk
    FROM fullp) WHERE rk <= 10
),
tr AS (
  SELECT query_id, corpus_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id) AS rk
    FROM truncp) WHERE rk <= 10
),
ov AS (
  SELECT fr.query_id, CAST(COUNT(tr.corpus_id) AS BIGINT) AS n_overlap
  FROM fr LEFT JOIN tr
    ON tr.query_id = fr.query_id AND tr.corpus_id = fr.corpus_id
  GROUP BY fr.query_id
)
SELECT query_id, n_overlap,
       round(n_overlap / 10.0, 6) AS recall_at_10
FROM ov
"""


@register("emb_matryoshka_recall", oracle=_MATRYOSHKA_ORACLE)
def q_emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit (Kusupati et al. 2022): how much of
    the full-dimension top-10 neighbor set survives when embeddings are
    truncated to their first {dims} of 64 dims — the measurement that
    decides whether a cheap low-dim prefilter (4× less IO and compute
    per comparison) is safe as the first stage of [[sim_query_topk]].

    Scale: both rankings are the broadcast-queries × corpus-stream
    shape of [[sim_cosine_topk]] (5-row build side, no shuffle of the
    corpus); the overlap join is on (query, corpus) keys of two
    top-10·|queries| frames — trivially small at any corpus size.
    """
    from random_forest_using_hadoop_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _cosine,
        _vectors,
    )

    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    c = v.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("corpus_id"), F.col("ve").alias("cv")
    )

    def _topk(qcol, ccol) -> DataFrame:
        pairs = c.crossJoin(F.broadcast(q)).select(
            "query_id",
            "corpus_id",
            F.round(_cosine(qcol, ccol), 6).alias("cos_sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), "corpus_id"
        )
        return (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "corpus_id")
        )

    full = _topk(F.col("qv"), F.col("cv"))
    trunc = _topk(
        F.slice(F.col("qv"), 1, _MATRYOSHKA_DIMS),
        F.slice(F.col("cv"), 1, _MATRYOSHKA_DIMS),
    )
    ov = (
        full.join(
            trunc.withColumn("hit", F.lit(1)), ["query_id", "corpus_id"], "left"
        )
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_overlap"))
    )
    return ov.select(
        "query_id",
        "n_overlap",
        F.round(F.col("n_overlap") / float(TOP_K), 6).alias("recall_at_10"),
    )


# --- triangle counting -------------------------------------------------------

_TRI_MIN_SHARED = 3

_TRIANGLE_ORACLE = f"""
WITH slot AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
  FROM events
),
e AS (
  SELECT a.user_id AS a, b.user_id AS b
  FROM slot a JOIN slot b
    ON a.event_type = b.event_type AND a.hr = b.hr
   AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_TRI_MIN_SHARED}
),
tri AS (
  SELECT 1 FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT user_id FROM (SELECT a AS user_id FROM e
                       UNION SELECT b FROM e)
)
SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
"""


@register("graph_triangle_count", oracle=_TRIANGLE_ORACLE)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the user co-activity graph
    (edge = two users sharing ≥{k} (event-type, hour) activity slots) —
    the clustering-coefficient numerator behind community/bot-ring
    detection, and with [[graph_pagerank]] the second classic graph
    kernel on the engine.

    Scale: edges come from a slot equi-join on already-DISTINCT
    (user, type, hour) rows — shuffle ∝ Σ slot²-per-key, never user².
    The count joins each wedge (e1.b=e2.a, id-ordered a<b<c so every
    triangle is built exactly once) against the closing edge — the
    standard compact-forward/node-iterator shape; at 100 TB orient
    edges by (degree, id) instead of raw id so wedge counts are bounded
    by m^1.5 even on skewed degree distributions (the id-ordering here
    is the same join plan with a different orientation key).

    Output-growth regime (measured, r9 scaling probe): this fixture
    pins the time span while users scale, so slot occupancy is ∝ sf and
    the ANSWER grows superlinearly — 1,367 → 137,910 edges (×101) and
    1,361 → 1,389,286 triangles (×1021) across the sf0.01→sf0.1 step.
    Wall time grew only ×11.5 (0.53 s → 6.16 s) against that ×1021
    output: the plan is output-bound, which is the optimum — no
    algorithm emits a quadratically larger answer in linear time. On a
    corpus whose co-activity density is held constant (time span ∝
    data, the realistic 100 TB shape), edges and triangles are ∝ users
    and the same plan is linear.
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
        .groupBy(
            F.col("x.user_id").alias("a"), F.col("y.user_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _TRI_MIN_SHARED)
        .select("a", "b")
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(F.lit(1).alias("one"))
    )
    nodes = e.select(F.col("a").alias("u")).union(
        e.select(F.col("b").alias("u"))
    ).distinct()
    return (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )
