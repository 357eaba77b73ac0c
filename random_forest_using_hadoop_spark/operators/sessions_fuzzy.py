"""Behavioral-analytics and fuzzy-matching operators: batch gap
sessionization, funnel analysis, and a blocked edit-distance similarity
join — the event-log and entity-resolution shapes the streaming session
windows (streaming/ops.py) and the token-based dedup family
(dedup_lsh.py) don't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import dsum, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

_GAP_US = 6 * 3600 * 1_000_000  # session break after 6h idle (µs)


# --- batch sessionization (gap-based) ----------------------------------------

_SESSION_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts, event_id, value,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
),
flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN gap_us IS NULL OR gap_us > {_GAP_US} THEN 1 ELSE 0 END AS is_new,
           event_id
    FROM ordered
),
sessioned AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {o_dsum('value')} AS total_value,
       CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT) AS duration_us
FROM sessioned
GROUP BY user_id, session_seq
"""


@register("win_sessionize_gap", oracle=_SESSION_ORACLE)
def q_win_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization: split each user's event stream into
    sessions at >6h idle gaps, then roll each session up to start time,
    event count, value sum, and duration — the lag→flag→running-sum→agg
    idiom (the batch twin of stream_session's state-timeout windows).

    Scale: everything partitions by user_id — one shuffle shared by the
    two window functions AND the final agg (same key, Catalyst reuses
    the exchange). No global sort; skewless (user event counts are
    bounded). (ts, event_id) makes the intra-user order total, so
    session boundaries are deterministic under ties. Gap arithmetic is
    exact integer microseconds on both engines (timestampdiff
    MICROSECOND ≡ date_diff('microsecond') at µs storage resolution —
    tz-free, so it's safe on timestamp_ntz under any driver session).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        "event_id",
        F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0).alias("is_new"),
    )
    sessioned = flagged.withColumn(
        "session_seq", F.sum("is_new").over(wsum).cast("bigint")
    )
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))")
        .cast("bigint")
        .alias("duration_us"),
    )


# --- funnel analysis ---------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY e.user_id
)
SELECT 'view' AS step, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'view>click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'view>click>purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


@register("agg_funnel_steps", oracle=_FUNNEL_ORACLE)
def q_agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after
    their first view, then purchased strictly after that first
    qualifying click — the classic product-analytics cascade, as
    per-step user counts.

    Scale: each stage is a hash agg on user_id followed by an equi-join
    on user_id — all three stages reuse one partitioning (no extra
    exchanges), and each stage's frame shrinks monotonically. The final
    3-row report unions single-row aggregates. Strict-after semantics
    use the full µs timestamp (equality ties don't advance the funnel
    on either engine).
    """
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("step"), "n_users"
        )
        .unionAll(
            s2.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click").alias("step"), "n_users"
            )
        )
        .unionAll(
            s3.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click>purchase").alias("step"), "n_users"
            )
        )
    )


# --- blocked edit-distance similarity join -----------------------------------

_FUZZY_ORACLE = """
WITH named AS (
    SELECT p_partkey, p_name,
           string_split(p_name, ' ')[-1] AS noun
    FROM part
)
SELECT a.p_partkey AS p1_key,
       b.p_partkey AS p2_key,
       a.p_name    AS name1,
       b.p_name    AS name2,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM named a
JOIN named b
  ON a.noun = b.noun
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
  AND a.p_name <> b.p_name
"""


@register("join_fuzzy_levenshtein", oracle=_FUZZY_ORACLE)
def q_join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: near-identical part names (edit distance
    ≤ 2, exact dups excluded) found with a blocked self-join — pairs
    are only generated within a block (shared trailing noun), never
    across the whole catalog.

    Scale (key widened r9): the block key turns an O(n²) all-pairs
    edit-distance scan into Σ O(|block|²) — but the noun alone draws
    from TPC-H's ~92-word palette, so noun blocks are ∝ catalog and
    pairs quadratic (the scaling probe measured 0.80 s → 53.0 s across
    one 10× step). The join key is now the COMPOSITE (noun, width-2
    length bin), both sides exploded to {bin, bin+1}: edit distance ≤ 2
    forces |Δlen| ≤ 2, and lengths within 2 always land in adjacent-or-
    equal width-2 bins, so the cover is lossless while collisions need
    a shared noun AND compatible length. The |Δlen| ≤ 2 residual then
    pre-prunes before the DP; at 100 TB keep widening (second noun,
    salt any mega-block) until blocks fit a task. levenshtein() runs
    JVM-side (codegen) on both engines with identical standard
    semantics; the p1 < p2 canonical order halves the pair space and
    makes output keys deterministic; the keep-once bin residual leaves
    exactly one collision per pair, so no distinct is needed.

    Output-growth regime (measured, r9): TPC-H part names draw from a
    finite word palette, so near-identical names — the ANSWER — grow
    quadratically: 21,847 pairs at sf0.01 → 2,392,052 at sf0.1 (×109).
    The plan is within ~10× of output-bound (25M candidates for 2.4M
    output rows at sf0.1); a PassJoin segment key could close most of
    that gap but cannot change the Θ(n²) answer on this fixture. On a
    real catalog (open name space, near-dup rate ~constant) the same
    plan is linear.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("noun"),
        F.floor(F.length("p_name") / 2).alias("lbin0"),
    )
    a = p.select(
        F.col("p_partkey").alias("p1_key"),
        F.col("p_name").alias("name1"),
        "noun",
        F.col("lbin0").alias("lbin_a"),
        F.explode(F.array(F.col("lbin0"), F.col("lbin0") + 1)).alias("lbin"),
    )
    b = p.select(
        F.col("p_partkey").alias("p2_key"),
        F.col("p_name").alias("name2"),
        "noun",
        F.col("lbin0").alias("lbin_b"),
        F.explode(F.array(F.col("lbin0"), F.col("lbin0") + 1)).alias("lbin"),
    )
    return (
        a.join(b, ["noun", "lbin"])
        .filter(F.col("p1_key") < F.col("p2_key"))
        # keep exactly one collision per pair (the larger home bin) —
        # same keep-once residual as the r3 length-bin cover, so no
        # distinct over the output is needed
        .filter(F.col("lbin") == F.greatest(F.col("lbin_a"), F.col("lbin_b")))
        .filter(
            F.abs(F.length("name1") - F.length("name2")) <= 2
        )
        .filter(F.col("name1") != F.col("name2"))
        # bounded levenshtein (Spark 3.5+): banded DP costs O(k·len)
        # instead of O(len²) and returns -1 above the threshold — the
        # kept rows carry the true distance, so parity with the
        # oracle's unbounded levenshtein() ≤ 2 filter is unchanged
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("name1"), F.col("name2"), 2).cast("bigint"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= 2))
        .select("p1_key", "p2_key", "name1", "name2", "edit_dist")
    )


# --- gaps & islands: consecutive same-type event runs -------------------------

_ISLANDS_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
    SELECT user_id, event_type, ts,
           SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS island_id
    FROM ordered
)
SELECT user_id,
       CAST(island_id AS BIGINT) AS island_id,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS island_start
FROM islands
GROUP BY user_id, island_id, event_type
"""


@register("win_gaps_islands", oracle=_ISLANDS_ORACLE)
def q_win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    user (a change in event_type starts a new island) — the value-change
    complement of [[win_sessionize_gap]]'s time-gap rule, and the classic
    pattern behind "current streak" / state-duration analytics.

    Scale: identical shuffle shape to sessionization — the lag flag, the
    running island counter, and the final per-island agg all share the
    user_id hash partitioning, so the whole operator is ONE exchange at
    any event volume. The (ts, event_id) order key is a total order, so
    island boundaries are deterministic cross-engine.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    islands = e.withColumn(
        "island_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy(
        "user_id",
        F.col("island_id").cast("bigint").alias("island_id"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("island_start"),
    )
