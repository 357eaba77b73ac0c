"""Scale-path extensions, part 2: interval-overlap joins, per-group
modes, power-sum correlation, corpus length histograms, URL parsing,
and z-score outlier screens.

All beyond SURVEY.md §2's letter keys, graded by the same
(spark_fn, oracle_sql) harness. Cross-engine hash policy follows
registry.py: fixed-point float aggregation, BIGINT-cast integer sums,
integer bucket math instead of float log/floor, no array-typed outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- interval-overlap join (binned blocking) ---------------------------------

_OVERLAP_ORACLE = """
WITH spans AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         MIN(ts) AS span_start, MAX(ts) AS span_end
  FROM events GROUP BY user_id, date_trunc('day', ts)
),
incidents AS (
  SELECT event_id, event_type,
         ts - INTERVAL 1 HOUR AS inc_start,
         ts + INTERVAL 1 HOUR AS inc_end
  FROM events WHERE value > 180
)
SELECT i.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT i.event_id) AS BIGINT) AS n_incidents
FROM spans s
JOIN incidents i
  ON s.span_start <= i.inc_end AND i.inc_start <= s.span_end
GROUP BY i.event_type
"""


@register("join_interval_overlap", oracle=_OVERLAP_ORACLE)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per-user daily activity spans vs ±1 h
    incident windows around high-value events, reported as per-type
    overlap counts. The oracle runs the definitional inequality theta
    join, so the hash match proves the binned rewrite is lossless.

    Scale: a raw overlap join is an inequality theta join — a nested
    loop at 100 TB. Here each span is keyed by its calendar day and
    each incident explodes to the (≤2, bounded by window/bin ratio)
    day bins it touches, turning the candidate step into a hash
    equi-join on the day; the exact inequality runs only on co-binned
    pairs. A span matches an incident on exactly one bin (the span's
    own day), so the rewrite introduces no duplicates and needs no
    dedup shuffle. Both sides come from one events scan each with
    map-side partial aggs; bin width tunes fan-out vs selectivity
    exactly like the n-gram length bins in dedup_ngram_jaccard.
    """
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.min("ts").alias("span_start"), F.max("ts").alias("span_end"))
    inc = (
        ev.filter(F.col("value") > 180)
        .select(
            "event_id",
            "event_type",
            (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("inc_start"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("inc_end"),
        )
        .withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.date_trunc("day", F.col("inc_start")),
                    F.date_trunc("day", F.col("inc_end")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ),
        )
    )
    pairs = spans.join(inc, "day").filter(
        (F.col("span_start") <= F.col("inc_end"))
        & (F.col("inc_start") <= F.col("span_end"))
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct("event_id").cast("bigint").alias("n_incidents"),
    )


# --- deterministic per-group mode --------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, cnt,
         ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY cnt DESC, event_type
         ) AS rk
  FROM c
)
SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS mode_cnt
FROM r WHERE rk = 1
"""


@register("agg_mode_pergroup", oracle=_MODE_ORACLE)
def q_agg_mode_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic
    tie-break (count DESC, then value ASC) — the aggregate SQL lacks
    and mode() implementations leave tie-order undefined on.

    Scale: stage 1 is a partial-agg-friendly (user, type) count whose
    output is bounded by |users|×|types|, not by row count; stage 2
    ranks inside each user over ≤|types| rows. Both stages share the
    user hash partitioning, so AQE coalesces to effectively one wide
    shuffle of the *reduced* frame — never a row-level sort.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").alias("mode_cnt"),
        )
    )


# --- correlation via exact integer power sums --------------------------------

# Quantize to 1e3; products/squares then fit BIGINT per row (max ~1e16)
# and accumulate exactly (Spark: DECIMAL(38,0); DuckDB: HUGEINT). The
# final Pearson formula runs in double on identical integers with an
# identical operation order, so the result is bit-identical by
# construction despite the classic power-sum cancellation.
_CORR_ORACLE = """
WITH q AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 1000.0 + 0.5) AS BIGINT) AS y,
         CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS z
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(z) AS DOUBLE) AS sz,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * z) AS DOUBLE) AS syz,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(z * z) AS DOUBLE) AS szz
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS corr_qty_price,
       round((n * syz - sy * sz)
             / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)), 6)
           AS corr_price_disc
FROM s
"""


@register("agg_corr_powersum", oracle=_CORR_ORACLE)
def q_agg_corr_powersum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations (quantity↔price, price↔discount)
    per return flag, from exact integer power sums — corr() itself is
    accumulation-order-dependent in every engine, so cross-engine (and
    cross-run, under AQE repartitioning) reproducibility requires the
    sums to be exact integers.

    Scale: one scan, one partial+final agg on a 3-value key carrying
    nine algebraic accumulators — the same merge-anywhere property
    HLL/quantile sketches have, so partials combine map-side and the
    final math runs on 3 rows. DECIMAL(38,0) accumulation costs ~2×
    codegen-long sums but only on 5 of 9 accumulators (the squares).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 1000.0 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 1000.0 + 0.5).cast("bigint").alias("y"),
        F.floor(F.col("l_discount") * 1000.0 + 0.5).cast("bigint").alias("z"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("y") * F.col("z"))).cast("double").alias("syz"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(dec(F.col("z") * F.col("z"))).cast("double").alias("szz"),
    )
    n, sx, sy, sz = F.col("n"), F.col("sx"), F.col("sy"), F.col("sz")
    sxy, syz = F.col("sxy"), F.col("syz")
    sxx, syy, szz = F.col("sxx"), F.col("syy"), F.col("szz")
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round(
            (n * syz - sy * sz) / F.sqrt((n * syy - sy * sy) * (n * szz - sz * sz)),
            6,
        ).alias("corr_price_disc"),
    )


# --- corpus length histogram (log2 buckets, integer math) --------------------

_LENHIST_ORACLE = """
WITH b AS (
  SELECT length(bin(n_chars)) - 1 AS bucket,
         COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY length(bin(n_chars)) - 1
),
t AS (SELECT CAST(SUM(chars) AS BIGINT) AS total FROM b)
SELECT b.bucket, CAST(b.n_docs AS BIGINT) AS n_docs, b.chars,
       round(CAST(b.chars AS DOUBLE) / t.total, 6) AS share,
       round(CAST(SUM(b.chars) OVER (ORDER BY b.bucket) AS DOUBLE)
             / t.total, 6) AS cum_share
FROM b, t
"""


@register("pipe_length_histogram", oracle=_LENHIST_ORACLE)
def q_pipe_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram with per-bucket corpus
    share and cumulative share — the datasheet a sequence-length /
    packing-budget decision reads. The bucket is the integer bit
    length (⌊log2⌋) computed via binary-string length, NOT float
    log2+floor, which flips at exact powers of two between libm
    implementations.

    Scale: one scan → partial agg on ≤64 bucket values; the share and
    cumulative window run on that ≤64-row frame in one task. Nothing
    downstream of the first agg depends on corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    b = (
        d.select(
            (F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)) - 1).alias(
                "bucket"
            ),
            "n_chars",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        b.withColumn("total", F.sum("chars").over(wall))
        .select(
            "bucket",
            "n_docs",
            "chars",
            F.round(F.col("chars").cast("double") / F.col("total"), 6).alias("share"),
            F.round(
                F.sum("chars").over(wcum).cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


# --- URL construction + parse_url family -------------------------------------

_URL_ORACLE = """
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       lang AS lang_param
FROM documents
"""


@register("fn_url_parse", oracle=_URL_ORACLE)
def q_fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family: build a canonical URL per document, then
    recover host / path / one query parameter with ``parse_url`` — the
    crawl-provenance normalization step every web-corpus pipeline runs.
    The oracle states the expected components directly, so a parse
    regression (e.g. query-string leakage into path) hash-mismatches.

    Scale: pure stateless projection — zero exchanges, whole-stage
    codegen end to end; at 100 TB this is scan-bandwidth-bound.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# --- z-score outlier screen (fixed-point group stats) ------------------------

_ZSCORE_ORACLE = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000.0 AS s1,
         CAST(SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)
                  * CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS s2
  FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_type, e.event_id,
         (e.value - s.s1 / s.n)
             / NULLIF(sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n),
                                    0)), 0)
           AS zscore
  FROM events e JOIN s ON e.event_type = s.event_type
)
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE abs(zscore) > 1.8) AS BIGINT) AS n_outliers,
       round(MAX(zscore), 6) AS max_z,
       round(MIN(zscore), 6) AS min_z
FROM z GROUP BY event_type
"""


@register("win_zscore_outlier", oracle=_ZSCORE_ORACLE)
def q_win_zscore_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier screen: group mean/std from exact
    fixed-point power sums (order-insensitive — stddev() itself is
    not), broadcast back onto the stream, |z| > 1.8 flagged.

    Scale: stats are one partial+final agg on the 5-value type key; the
    5-row stats frame broadcasts back (map-side join, no second
    shuffle of the fact). The z projection and the final per-type
    rollup reuse the scan — never a window over the raw stream, which
    would force a full sort per type.
    """
    ev = load_table(spark, sf_dir, "events")
    fx = F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(fx).cast("double") / 1000.0).alias("s1"),
        (F.sum(fx * fx).cast("double") / 1000000.0).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    # greatest(·, 0): cancellation leaves a tiny NEGATIVE for a
    # zero-variance group with non-dyadic values (v = s2/n - mean²
    # ≈ -1e-18) — DuckDB sqrt(negative) hard-errors while Spark
    # returns NaN, so both engines clamp before the root
    std = F.sqrt(
        F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    )
    # try_divide: a zero-variance group (all values equal) has std 0 —
    # NULL z on both engines (oracle: NULLIF) instead of an ANSI crash
    # (found by tests/test_fuzz_relational.py's micro events stream)
    z = ev.join(F.broadcast(s), "event_type").select(
        "event_type",
        "event_id",
        F.try_divide(F.col("value") - mean, std).alias("zscore"),
    )
    return z.groupBy("event_type").agg(
        F.count(F.when(F.abs(F.col("zscore")) > 1.8, 1)).alias("n_outliers"),
        F.round(F.max("zscore"), 6).alias("max_z"),
        F.round(F.min("zscore"), 6).alias("min_z"),
    )


# --- spatial epsilon-join via grid blocking ----------------------------------

_EPS = 2.0  # also the grid cell size: neighbors-of-home covers all pairs

# floor(epoch(ts)): whole seconds, matching Spark's unix_timestamp()
# truncation — DuckDB's raw epoch() keeps the nanosecond fraction the
# Spark side cannot see, which shifted y by ≤1.67e-3 cells and flipped
# a pair sitting on the ε=2 boundary (first such pair appears at
# sf0.1; found by the r9 full sf0.1 parity sweep)
_SPATIAL_ORACLE = """
WITH pts AS (
  SELECT event_id, value AS x,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS DOUBLE) / 600.0 AS y
  FROM events WHERE value > 190
),
pairs AS (
  SELECT a.event_id AS id_a, b.event_id AS id_b,
         sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d
  FROM pts a JOIN pts b ON a.event_id < b.event_id
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 2.0
)
SELECT CAST(floor(d) AS BIGINT) AS dist_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT id_a) AS BIGINT) AS n_left
FROM pairs GROUP BY CAST(floor(d) AS BIGINT)
"""


@register("join_spatial_grid", oracle=_SPATIAL_ORACLE)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-distance spatial self-join: high-value events as 2-D
    points (value × time-of-day), all pairs within Euclidean ε=2,
    bucketed by distance. The oracle is the definitional quadratic
    theta join, so the hash match proves the grid rewrite lossless.

    Scale: all-pairs distance is O(n²) — a few trillion candidates per
    day at 100 TB event volume. With cell size = ε, any qualifying pair
    sits in the same or an adjacent cell, so side A explodes to its
    3×3 cell neighborhood (bounded 9× fan-out) and candidates come
    from a hash equi-join against side B's unique home cell — a pair
    is met exactly once (at B's home), so no dedup shuffle. Work
    scales with points-per-cell density, not n²; the exact distance
    predicate runs on co-celled candidates only. Same doctrine as
    PostGIS ST_DWithin grid plans and Spark's own range-join binning.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(F.col("value") > 190).select(
        "event_id",
        F.col("value").alias("x"),
        (
            (F.unix_timestamp(F.col("ts")) % 86400).cast("double") / 600.0
        ).alias("y"),
    )
    cx = F.floor(F.col("x") / _EPS).cast("bigint")
    cy = F.floor(F.col("y") / _EPS).cast("bigint")
    home = pts.select(
        F.col("event_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    probe = (
        pts.select(
            F.col("event_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            cx.alias("hx"),
            cy.alias("hy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("hx") + F.col("dx")).alias("cx"),
            (F.col("hy") + F.col("dy")).alias("cy"),
        )
    )
    d = F.sqrt(
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    pairs = (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d.alias("d"))
        .filter(F.col("d") <= _EPS)
    )
    return pairs.groupBy(
        F.floor(F.col("d")).cast("bigint").alias("dist_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("id_a").cast("bigint").alias("n_left"),
    )


# --- per-source type-token ratio ---------------------------------------------

_TTR_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
       round(CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*), 6) AS ttr
FROM tok GROUP BY source
"""


@register("text_ttr", oracle=_TTR_ORACLE)
def q_text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type-token ratio — the lexical-diversity signal used
    to flag boilerplate-heavy or template-generated corpus slices
    (low TTR → near-duplicate phrasing even when documents differ).

    Scale: explode(split) is a flatMap projection — no shuffle; the
    distinct-count aggregates partially on (source, token) before the
    final per-source merge, so shuffle volume is bounded by the
    vocabulary per source, not the token stream. For web-scale
    vocabularies, swap count_distinct for approx_count_distinct — the
    agg topology is unchanged (agg_approx_distinct shows the swap).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").cast("bigint").alias("n_types"),
        F.round(
            F.count_distinct("token").cast("double") / F.count(F.lit(1)), 6
        ).alias("ttr"),
    )


# --- skewness/kurtosis from exact integer power sums -------------------------

# Standardized moments are scale-invariant, so they are computed directly
# over the ×100-quantized integers — no unscaling step. Per-row x^4 does
# NOT fit BIGINT on every graded corpus (the r9 full-registry scale scan
# crashed at sf0.1: max value 560.21 → x = 56,021 → x⁴ = 9.85e18 >
# 2⁶³−1, a margin the sf0.01 grading corpus — max 490 → 5.8e18 — never
# touches), so BOTH engines now widen BEFORE multiplying: Spark casts x
# to DECIMAL(38,0) and multiplies in decimal, DuckDB casts to HUGEINT.
# Same integers, exact accumulation, envelope now |x| ≤ ~1e9 per row.
# skewness()/kurtosis() builtins are accumulation-order dependent in
# both engines — unusable for a cross-engine hash match.
_MOMENTS_ORACLE = """
WITH q AS (
  SELECT event_type,
         CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS HUGEINT) AS x
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(x * x) AS DOUBLE) AS s2,
         CAST(SUM(x * x * x) AS DOUBLE) AS s3,
         CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
  FROM q GROUP BY event_type
),
m AS (
  SELECT event_type, n, s1 / n AS m1,
         s2 / n - (s1 / n) * (s1 / n) AS v,
         s3 / n AS r3, s2 / n AS r2, s4 / n AS r4
  FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_rows,
       round((r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)
             / NULLIF(sqrt(v) * v, 0), 6) AS skewness,
       round((r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1)
             / NULLIF(v * v, 0) - 3.0, 6) AS excess_kurtosis
FROM m
"""


@register("agg_skew_kurtosis", oracle=_MOMENTS_ORACLE)
def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type skewness and excess kurtosis from exact integer power
    sums — the distribution-shape audit a feature-quality monitor runs,
    reproducible across engines and AQE repartitioning where the
    builtin skewness()/kurtosis() are not.

    Scale: identical shape to agg_corr_powersum — one scan, one
    partial+final agg on the 5-value type key carrying five algebraic
    accumulators; the moment algebra runs on 5 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    q = ev.select("event_type", x.alias("x"))
    # widen to decimal BEFORE multiplying — x*x*x*x in BIGINT is an
    # ANSI ARITHMETIC_OVERFLOW once |x| > 55,108 (see the envelope note
    # on the oracle above; caught live at sf0.1 by the r9 scale scan)
    xd = F.col("x").cast("decimal(38,0)")
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
        F.sum(xd * xd * xd).cast("double").alias("s3"),
        F.sum(xd * xd * xd * xd).cast("double").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    r2 = F.col("s2") / n
    r3 = F.col("s3") / n
    r4 = F.col("s4") / n
    v = r2 - m1 * m1
    # try_divide / NULLIF: a zero-variance group zeroes both moment
    # denominators — skewness/kurtosis are undefined there, NULL on
    # both engines (found by tests/test_fuzz_relational.py)
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_rows"),
        F.round(
            F.try_divide(r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1, F.sqrt(v) * v), 6
        ).alias("skewness"),
        F.round(
            F.try_divide(
                r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1,
                v * v,
            )
            - 3.0,
            6,
        ).alias("excess_kurtosis"),
    )


# --- Shannon entropy of per-user behavior ------------------------------------

# c·ln(c) is quantized to 1e6 fixed point BEFORE the per-user sum, so the
# only float operation shared across engines is ln() itself on identical
# integer inputs (the same contract text_tokens_tfidf's hash match
# already proves holds for these engines' libm).
_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
),
u AS (
  SELECT user_id,
         CAST(SUM(cnt) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(floor(cnt * ln(cnt) * 1000000.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000.0 AS sclnc
  FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       round(ln(n_events) - sclnc / n_events, 6) AS entropy_nats
FROM u
"""


@register("agg_entropy", oracle=_ENTROPY_ORACLE)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — the behavioral
    diversity signal bot-detection and engagement scoring read (H = 0
    → single-action automation; high H → organic use). Uses the
    algebraic identity H = ln(n) − (Σ c·ln c)/n so entropy needs only
    per-(user,type) counts, never per-row probabilities.

    Scale: stage 1 is the same bounded (user,type) count as
    agg_mode_pergroup; stage 2 reduces ≤|types| rows per user. Both
    stages share the user hash partitioning; nothing touches the raw
    stream after the first partial agg.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    clnc_fx = F.floor(
        F.col("cnt") * F.log(F.col("cnt")) * 1000000.0 + 0.5
    ).cast("bigint")
    u = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        (F.sum(clnc_fx).cast("double") / 1000000.0).alias("sclnc"),
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        F.round(
            F.log(F.col("n_events")) - F.col("sclnc") / F.col("n_events"), 6
        ).alias("entropy_nats"),
    )


# --- Gini concentration per group --------------------------------------------

_GINI_ORACLE = """
WITH r AS (
  SELECT event_type,
         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x,
         ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY value, event_id
         ) AS i
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(i * x) AS DOUBLE) AS six
  FROM r GROUP BY event_type
)
SELECT event_type, n AS n_rows,
       round((2.0 * six - (n + 1.0) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
FROM s
"""


@register("agg_gini_concentration", oracle=_GINI_ORACLE)
def q_agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Gini coefficient of the value distribution — the
    inequality/concentration audit (is 1% of events carrying 90% of
    value?) via the rank formula G = (2Σi·xᵢ − (n+1)Σxᵢ)/(nΣxᵢ) with a
    deterministic tie-break (value, event_id) and fixed-point sums.

    Scale: exact Gini needs each row's rank, so one shuffle partitions
    by type and sorts within — the window and both aggregates then
    share that single exchange. For groups too large to sort, the
    approximate path is a quantile-sketch Lorenz curve (see
    agg_quantile_rollup); the exact operator stays the audit tool.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("six"),
    )
    n, sx = F.col("n"), F.col("sx")
    return s.select(
        "event_type",
        n.alias("n_rows"),
        F.round(
            (2.0 * F.col("six") - (n + 1.0) * sx.cast("double"))
            / (n.cast("double") * sx.cast("double")),
            6,
        ).alias("gini"),
    )


# --- runtime bloom-filter join ------------------------------------------------

_BLOOM_CONFS = {
    # bloom injection is on by default but gated by thresholds tuned for
    # clusters; pin them so the demo triggers at test SF. broadcast is
    # disabled because the runtime filter only arms shuffle joins (a
    # broadcast join already prunes at the probe).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

_BLOOM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l.l_extendedprice * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1000000.0 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority
"""


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle join Catalyst arms with a runtime bloom filter:
    selective build side (urgent orders) → bloom_filter_agg subquery →
    might_contain pushed into the fact scan's data filters."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    fx = F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(fx) / 1000000.0).alias("revenue"),
        )
    )


@register("join_runtime_bloomfilter", oracle=_BLOOM_ORACLE)
def q_join_runtime_bloomfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join: the build side's keys become a bloom
    filter that Catalyst injects as a might_contain predicate on the
    FACT SCAN — rows that cannot join are dropped before the shuffle,
    the runtime analog of DPP for non-partition keys (gated in
    tests/test_plans.py).

    Scale: on a 100 TB fact⋈selective-dim shuffle join this is the
    difference between shuffling the whole fact and shuffling only
    might-match rows (false-positive rate bounded by the filter's
    sizing). The tuned thresholds are session-scoped to this operator
    and RESTORED afterward — they must not leak into the grading
    session — so the join materializes here (write → read-back, the
    sink ops' doctrine) rather than deferring execution past the
    restore.
    """
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    prior = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    path = _tmp(sf_dir, "bloom_join")
    try:
        _bloom_join(spark, sf_dir).write.mode("overwrite").parquet(path)
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(path)


# --- URL canonicalization dedup ----------------------------------------------

_URL_CANON_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/docs/'
                       || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed&id=1'
           WHEN 1 THEN 'https://www.example.com/docs/'
                       || CAST(doc_id // 4 AS VARCHAR) || '/?id=1'
           WHEN 2 THEN 'https://www.example.com/docs/'
                       || CAST(doc_id // 4 AS VARCHAR) || '?id=1&utm_campaign=x'
           ELSE 'https://www.example.com/docs/'
                       || CAST(doc_id // 4 AS VARCHAR) || '?id=1'
         END AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), ':443/', '/'),
               'utm_[a-z]+=[^&]*&?', ''),
             '[?&]$', ''),
           '/\\?', '?') AS cu
  FROM raw
),
norm AS (
  SELECT doc_id,
         CASE WHEN cu LIKE '%/' THEN substr(cu, 1, length(cu) - 1) ELSE cu END
             AS curl
  FROM canon
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
       CAST(COUNT(*) - COUNT(DISTINCT curl) AS BIGINT) AS n_dup_removed
FROM norm
"""


@register("pipe_url_canonical_dedup", oracle=_URL_CANON_ORACLE)
def q_pipe_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-frontier step that
    collapses scheme/host case, default ports, tracking parameters
    (utm_*), and trailing slashes before content is ever fetched. Four
    synthetic variants per canonical URL (uppercase host + :443,
    trailing slash, utm decoration, clean) are normalized by a chain of
    deterministic regex rewrites shared verbatim with the oracle; the
    graded projection proves every variant group collapses to one
    canonical form (n_dup_removed = 3/4 of the corpus).

    Scale: stateless projection + one distinct-count — the dedup
    itself is the exact content-hash pattern (dedup_exact) applied to
    the canonical URL; at crawl scale the canonical form is the
    partition key of the frontier store.
    """
    d = load_table(spark, sf_dir, "documents")
    base = F.concat(F.lit("www.example.com/docs/"),
                    (F.col("doc_id") / 4).cast("bigint").cast("string"))
    raw = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("HTTPS://WWW.Example.COM:443/docs/"),
                     (F.col("doc_id") / 4).cast("bigint").cast("string"),
                     F.lit("?utm_source=feed&id=1")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://"), base, F.lit("/?id=1")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://"), base, F.lit("?id=1&utm_campaign=x")),
        )
        .otherwise(F.concat(F.lit("https://"), base, F.lit("?id=1")))
        .alias("url"),
    )
    cu = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("url")), ":443/", "/"),
                "utm_[a-z]+=[^&]*&?",
                "",
            ),
            "[?&]$",
            "",
        ),
        "/\\?",
        "?",
    )
    norm = raw.select(cu.alias("cu")).select(
        F.regexp_replace(F.col("cu"), "/$", "").alias("curl")
    )
    return norm.agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("curl").alias("n_canonical"),
        (F.count(F.lit(1)) - F.count_distinct("curl")).alias("n_dup_removed"),
    )


# --- user path-pattern mining ------------------------------------------------

_PATH_TOPN = 20

_PATH_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS path
  FROM events GROUP BY user_id
),
pre AS (
  SELECT substr(path, 1, 5) AS path5, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM seq GROUP BY 1
)
SELECT path5, n_users FROM pre
ORDER BY n_users DESC, path5 LIMIT {_PATH_TOPN}
"""


@register("agg_user_path_patterns", oracle=_PATH_ORACLE)
def q_agg_user_path_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis — the product-analytics query behind every Sankey
    funnel diagram: encode each user's event stream as an ordered
    symbol string (first letter of event_type, strictly ordered by
    (ts, event_id)), truncate to the first five steps, and rank the
    top-{n} entry paths by user count. Ordering inside the aggregation
    is explicit on both engines (sort_array of (ts, event_id, symbol)
    structs here; string_agg ORDER BY there), so the path strings are
    deterministic, not shuffle-order artifacts.

    Scale: one shuffle keyed by user (the sequence build — bounded by
    per-user event counts), one hash agg on the ≤5-symbol prefix
    (tiny domain), and a TakeOrderedAndProject for the top-{n} —
    never a global sort of users or events.
    """.format(n=_PATH_TOPN)
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias(
                "e"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda x: x["c"]
                ),
            ).alias("path")
        )
    )
    pre = seq.select(F.substring("path", 1, 5).alias("path5"))
    return (
        pre.groupBy("path5")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path5")
        .limit(_PATH_TOPN)
    )


# --- IPv4 subnet rollup ------------------------------------------------------

_IP_ORACLE = """
WITH ip AS (
  SELECT user_id,
         (user_id * 2654435761) % 16777216 AS host24
  FROM (SELECT DISTINCT user_id FROM events)
),
oct AS (
  SELECT user_id,
         10 AS o1,
         host24 // 65536 AS o2,
         (host24 // 256) % 256 AS o3,
         host24 % 256 AS o4
  FROM ip
)
SELECT '10.' || CAST(o2 AS VARCHAR) || '.0.0/16' AS subnet,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(MIN(o3 * 256 + o4) AS BIGINT) AS min_host_part,
       CAST(MAX(o3 * 256 + o4) AS BIGINT) AS max_host_part
FROM oct
GROUP BY 1
"""


@register("fn_ipv4_subnet", oracle=_IP_ORACLE)
def q_fn_ipv4_subnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address synthesis + /16 subnet rollup — the network-log
    aggregation shape (hosts per subnet, address-range audit): each
    user gets a deterministic 10.0.0.0/8 address from a Knuth
    multiplicative hash of its id (pure integer div/mod octet math,
    identical in both engines), then hosts roll up to /16 prefixes.
    CIDR prefix aggregation is integer prefix arithmetic, not string
    parsing — the same div/mod ladder handles any prefix length.

    Scale: distinct users → stateless octet projection → one hash agg
    on the subnet prefix; at flow-log scale the /16 key is deliberately
    low-cardinality, so map-side combine collapses each task to ≤256
    cells.
    """
    ev = load_table(spark, sf_dir, "events")
    ip = ev.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 2654435761) % 16777216).alias("host24"),
    )
    oct_ = ip.select(
        F.expr("host24 div 65536").alias("o2"),
        (F.expr("host24 div 256") % 256).alias("o3"),
        (F.col("host24") % 256).alias("o4"),
    )
    return (
        oct_.groupBy(
            F.concat(F.lit("10."), F.col("o2").cast("string"), F.lit(".0.0/16")).alias(
                "subnet"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.min(F.col("o3") * 256 + F.col("o4")).cast("bigint").alias(
                "min_host_part"
            ),
            F.max(F.col("o3") * 256 + F.col("o4")).cast("bigint").alias(
                "max_host_part"
            ),
        )
    )
