"""Join operators — SURVEY.md §2 B10–B18.

Reference analog [recon]: the reference never joins; its one "broadcast"
is shipping the forest file via DistributedCache — the mechanic B10's
``broadcast()`` hint generalizes.

Scale doctrine per join: small dims broadcast (no shuffle of the fact
side); fact⋈fact shuffles on the key with AQE skew-splitting; semi/anti
express EXISTS without materializing the probe side's payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from random_forest_using_hadoop_spark.helpers import dsum, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B10: broadcast hash join (fact ⋈ tiny dim) ------------------------------

_B10_ORACLE = f"""
SELECT p.p_brand,
       COUNT(*) AS n_lines,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("join_broadcast", oracle=_B10_ORACLE)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: explicit broadcast of the part dim — the fact side never
    shuffles for the join; only the 25-brand aggregate exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --- B11: shuffle sort-merge join (fact ⋈ fact) ------------------------------

_B11_ORACLE = f"""
SELECT o.o_orderstatus,
       COUNT(*) AS n_lines,
       {o_dsum('l.l_quantity')} AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""


@register("join_sortmerge", oracle=_B11_ORACLE)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: the big-⋈-big path. The MERGE hint pins sort-merge (both
    sides shuffle on l_orderkey/o_orderkey, sort, streamc-merge) — the
    strategy that scales when neither side fits in memory; spills are
    sort-based, never OOM-by-design.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


# --- B12: multiway star join -------------------------------------------------

_B12_ORACLE = f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_orders,
       {o_dsum('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("join_multiway", oracle=_B12_ORACLE)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: 4-way star join. customer/nation/region all broadcast
    (auto below the threshold; nation/region are tiny at any sf), so the
    orders fact streams through three broadcast joins with zero
    pre-aggregation shuffles — the canonical 100 TB star-join plan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


# --- B13: outer join ---------------------------------------------------------

_B13_ORACLE = """
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       COALESCE(ROUND(MAX(o.o_totalprice), 6), -1.0) AS max_total
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("join_outer", oracle=_B13_ORACLE)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: left outer join keeping order-less customers (COUNT skips the
    manufactured NULLs; COALESCE gives them a sentinel)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.round(F.max("o_totalprice"), 6), F.lit(-1.0)).alias("max_total"),
        )
    )


# --- B14 / B15: semi + anti (EXISTS / NOT EXISTS) ----------------------------

_B14_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


@register("join_semi", oracle=_B14_ORACLE)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: left-semi — probe side contributes existence only, so no
    payload columns cross the shuffle and duplicates never multiply."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_B15_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("join_anti", oracle=_B15_ORACLE)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: left-anti (NOT EXISTS) — same result as B9's outer+IS NULL
    but without materializing the nullable payload."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- B16: theta/range join ---------------------------------------------------

_B16_ORACLE = """
SELECT e1.user_id, COUNT(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.event_id <> e1.event_id
 AND e2.ts BETWEEN e1.ts AND e1.ts + INTERVAL 10 MINUTE
GROUP BY e1.user_id
"""


@register("join_theta_range", oracle=_B16_ORACLE)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: equi+range composite self-join (events within 10 minutes
    after each event, same user).

    Scale: the user_id equi-key keeps this a hash/merge join with the
    range as a post-filter — never a cross product; per-user skew is the
    risk and AQE skew-split the mitigation.
    """
    ev = load_table(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.event_id") != F.col("e1.event_id"))
        & (F.col("e2.ts") >= F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        e1.join(e2, cond)
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- B17: as-of join ---------------------------------------------------------

_B17_ORACLE = """
SELECT e1.event_id, e1.user_id, e1.ts, e2.ts AS prev_ts
FROM events e1 ASOF LEFT JOIN events e2
  ON e1.user_id = e2.user_id AND e2.ts < e1.ts
"""


@register("join_asof", oracle=_B17_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: as-of join (latest strictly-earlier event per user), which
    Spark SQL lacks natively — expressed as a RANGE-frame window max
    over epoch-µs ordering, semantically DuckDB's ``ASOF JOIN .. ts < ts``.

    Scale: one shuffle on user_id + a sort — same cost class as any
    windowed analytic; never a self-join explosion. Tie-safety: the max
    of prior timestamps is deterministic even with duplicate (user, ts).
    """
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(W.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.timestamp_micros(F.max(ts_us).over(w)).cast("timestamp_ntz").alias("prev_ts"),
    )


# --- B18: cross join ---------------------------------------------------------

_B18_ORACLE = """
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
"""


@register("join_cross", oracle=_B18_ORACLE)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: cartesian product of two fixed-size dims (5×25). Only ever
    sane when one side is tiny — Spark broadcasts it (BroadcastNestedLoop)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --- bucketed co-located join (shuffle-free fact ⋈ fact) ---------------------

_BUCKETED_ORACLE = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       {o_dsum('l.l_extendedprice')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("join_bucketed_colocated", oracle=_BUCKETED_ORACLE)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact with *zero* join-side shuffle: both tables are written
    bucketed+sorted by the join key, so the sort-merge join reads
    co-located buckets directly (no Exchange above either scan — asserted
    in test_plans).

    This is the 100 TB answer to repeated big-table joins: pay the
    bucketed write once, then every subsequent join/groupBy on the
    bucket key is shuffle-free. Bucket count here is 8 for the test sf;
    at scale pick buckets ≈ cluster cores so each bucket is one task.
    """
    import tempfile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    tag = abs(hash(sf_dir)) % (1 << 30)
    names = {"li": f"li_bkt_{tag}", "o": f"o_bkt_{tag}"}
    if not spark.catalog.tableExists(names["li"]):
        base = tempfile.mkdtemp(prefix="bucketed_")
        for name, df, key in (
            (names["li"], li, "l_orderkey"),
            (names["o"], o, "o_orderkey"),
        ):
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{base}/{name}")
                .mode("overwrite")
                .saveAsTable(name)
            )
    lb, ob = spark.table(names["li"]), spark.table(names["o"])
    # hint merge: at test sf the dims fit the broadcast threshold, which
    # would hide the bucketing; at 100 TB neither side broadcasts and
    # SMJ-over-buckets is exactly the plan this operator pins
    return (
        lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )


# --- binned interval join: range join WITHOUT an equi key --------------------

# Without an equi key, a range predicate alone plans as a nested-loop
# cartesian — O(|L|·|R|), dead at scale. The fix is the canonical
# interval-join binning trick (Flink interval join / Databricks
# range-join hint): quantize time into bins the width of the lookback
# window, explode each probe row to its two candidate bins, equi-join on
# the bin, then apply the exact range filter. Candidates ∝ rows × 2 ×
# bin density, never |L|·|R|.
_BINNED_ORACLE = """
SELECT p.event_id, COUNT(*) AS n_prior_err
FROM events p
JOIN events e
  ON e.ts >= p.ts - INTERVAL 10 MINUTE AND e.ts < p.ts
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
GROUP BY p.event_id
"""

_BIN_US = 600 * 1_000_000  # bin width == lookback window (10 min)


@register("join_range_binned", oracle=_BINNED_ORACLE)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors in the 10 minutes before each purchase, across ALL users —
    a pure range join (no equi key) made shuffle-joinable by binning.

    A window of width W spans at most 2 bins of width W, so each
    purchase probes exactly bins {b-1, b}: the explode is a constant
    2× fan-out on the (smaller) probe side, the join is a plain hash
    equi-join on the bin id, and the exact BETWEEN runs as a
    post-filter. Scale: shuffle ∝ rows, candidate pairs ∝ co-binned
    density; skewed bins (event storms) split via AQE like any hot
    equi-key.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("ts").alias("e_ts"),
            F.floor(us / _BIN_US).cast("bigint").alias("bin"),
        )
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.col("ts").alias("p_ts"),
            F.explode(
                F.array(
                    F.floor(us / _BIN_US).cast("bigint") - 1,
                    F.floor(us / _BIN_US).cast("bigint"),
                )
            ).alias("bin"),
        )
    )
    return (
        purch.join(err, "bin")
        .filter(
            (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("e_ts") < F.col("p_ts"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_prior_err"))
    )


# --- null-split outer join (null-key hot-partition mitigation) ----------------

_NULLSPLIT_ORACLE = """
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_type = 'view' THEN NULL ELSE user_id END AS actor_id,
         event_type
  FROM events
),
dim AS (
  SELECT DISTINCT user_id % 10 AS cohort_key, 'cohort_' || (user_id % 10) AS cohort
  FROM events
)
SELECT ev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN d.cohort IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched
FROM ev LEFT JOIN dim d ON ev.actor_id % 10 = d.cohort_key
GROUP BY ev.event_type
"""


@register("join_null_split", oracle=_NULLSPLIT_ORACLE)
def q_join_null_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join on a NULL-heavy key with the null-split rewrite:
    anonymous events (views — their actor is NULL) can never match, yet
    a naive outer join still shuffles every NULL row into one reducer
    (all NULLs hash alike) — the canonical null-skew hot partition. The
    rewrite splits the probe side: non-null rows take the real join,
    NULL rows bypass it entirely and union back with the dim columns
    nulled — same SQL semantics (NULL never equals), no NULL ever
    shuffles on the join key.

    Scale: at 100 TB with 30% anonymous traffic the naive plan ships
    30 TB into one task; the split plan ships zero. The union is a
    no-shuffle concat; the final rollup shuffles on its own group key.
    The oracle runs the NAIVE single outer join — a hash match proves
    the rewrite is semantics-preserving.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "view", F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("actor_id"),
        "event_type",
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % 10).alias("cohort_key"))
        .distinct()
        .withColumn("cohort", F.concat(F.lit("cohort_"), F.col("cohort_key")))
    )
    nonnull = ev.filter(F.col("actor_id").isNotNull()).join(
        dim, F.col("actor_id") % 10 == F.col("cohort_key"), "left"
    )
    nulls = ev.filter(F.col("actor_id").isNull()).select(
        "event_id",
        "actor_id",
        "event_type",
        F.lit(None).cast("long").alias("cohort_key"),
        F.lit(None).cast("string").alias("cohort"),
    )
    joined = nonnull.unionByName(nulls)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("cohort").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unmatched"),
    )


# --- as-of join with tolerance -----------------------------------------------

_ASOF_TOL_MIN = 30  # only match a prior purchase within this many minutes

_ASOF_TOL_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT e.event_id, e.user_id, e.ts, MAX(p.pts) AS prev_purchase_ts
  FROM e LEFT JOIN p
    ON p.user_id = e.user_id
   AND p.pts < e.ts
   AND p.pts >= e.ts - INTERVAL {_ASOF_TOL_MIN} MINUTE
  GROUP BY 1, 2, 3
)
SELECT event_id, user_id, ts, prev_purchase_ts,
       prev_purchase_ts IS NOT NULL AS matched
FROM m
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof's
    ``tolerance=`` semantics): each click matches the latest strictly
    earlier purchase by the same user, but only within {m} minutes —
    beyond the window the match is NULL rather than an arbitrarily
    stale row, which is what makes as-of features safe for
    time-decaying signals. Same RANGE-frame shape as join_asof with the
    frame's lower bound finite: [−{m} min, −1 µs) in epoch-µs space, so
    the tolerance is enforced by the frame itself, not a post-filter.

    Scale: one shuffle on user_id + per-user ordered frame — cost
    identical to the unbounded as-of; the oracle's definitional
    bounded theta-join is what this plan avoids.
    """.format(m=_ASOF_TOL_MIN)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
    )
    both = clicks.unionByName(purch)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-_ASOF_TOL_MIN * 60 * 1_000_000, -1)
    )
    prev = F.max(F.when(F.col("is_p") == 1, ts_us)).over(w)
    return (
        both.withColumn("_prev", prev)
        .filter(F.col("is_p") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.timestamp_micros(F.col("_prev"))
            .cast("timestamp_ntz")
            .alias("prev_purchase_ts"),
            F.col("_prev").isNotNull().alias("matched"),
        )
    )
