"""Hierarchical-rollup, safe-expression, and iterative-graph operators.

- ``agg_time_ladder``: the continuous-aggregate / hypertable-rollup
  pattern — day totals derived from hour partials derived from minute
  partials, never from raw rows twice.
- ``fn_try_safe``: the error-tolerant expression surface (try_divide /
  try_element_at semantics) a dirty-data pipeline needs.
- ``graph_pagerank``: fixed-iteration PageRank over the order graph —
  the engine's iterative-algorithm pattern (persist per iteration,
  quantized-exact message sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- time-ladder rollup ------------------------------------------------------

_LADDER_ORACLE = f"""
SELECT date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {o_dsum('value')} AS total_value
FROM events
GROUP BY day
ORDER BY day
"""


@register("agg_time_ladder", oracle=_LADDER_ORACLE)
def q_agg_time_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day totals computed by
    LADDERING — raw events roll to minute partials, minutes merge into
    hours, hours merge into days. The oracle aggregates raw rows
    directly, so a hash match PROVES the partials are losslessly
    mergeable (the property that makes incremental materialized rollups
    trustworthy).

    Scale: at 100 TB the minute layer is the only pass over raw data;
    each higher rung re-aggregates ~60× fewer rows, and a late-arriving
    partition only re-rolls its own minute/hour cells. Counts and
    fixed-point bigint value-sums are associative — merge order can
    never change a cell. One shuffle per rung, each a tiny fraction of
    the previous rung's output.
    """
    e = load_table(spark, sf_dir, "events")
    fixed = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    minute = e.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(fixed).alias("fv"),
    )
    hour = minute.groupBy(F.date_trunc("hour", "minute").alias("hour")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("fv").alias("fv"),
    )
    return (
        hour.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            (F.sum("fv") / F.lit(1_000_000.0)).alias("total_value"),
        )
        .orderBy("day")
    )


# --- try_* safe-expression family --------------------------------------------

_TRY_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_zero_div,
       CAST(SUM(CAST(floor((CASE WHEN l_discount <> 0.0
                    THEN l_tax / l_discount END) * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 1000000.0 AS sum_safe_ratio,
       CAST(COUNT(*) FILTER (WHERE string_split(l_linestatus, '')[5] IS NULL)
            AS BIGINT) AS n_short
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("fn_try_safe", oracle=_TRY_ORACLE)
def q_fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expression surface: try_divide turns /0 into NULL
    (counted, then excluded from the fixed-point ratio sum) and
    try_element_at turns out-of-range access into NULL instead of an
    error — the semantics that keep a 100 TB batch job from dying on
    row 10¹².

    Scale: a stateless projection + one hash agg; the try_* forms are
    codegen expressions, not UDFs, so the safety is free. NULL-skipping
    SUM matches the oracle's CASE-gated sum by SQL semantics.
    """
    li = load_table(spark, sf_dir, "lineitem")
    safe_ratio = F.try_divide(F.col("l_tax"), F.col("l_discount"))
    fixed = F.floor(safe_ratio * 1_000_000.0 + 0.5).cast("bigint")
    fifth_char = F.try_element_at(F.split(F.col("l_linestatus"), ""), F.lit(5))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") == 0.0, 1)).alias("n_zero_div"),
            (F.sum(fixed) / F.lit(1_000_000.0)).alias("sum_safe_ratio"),
            F.count(F.when(fifth_char.isNull(), 1)).alias("n_short"),
        )
        .orderBy("l_returnflag")
    )


# --- fixed-iteration PageRank ------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 3
_PR_SCALE = 1_000_000_000_000  # 1e12 contribution quantum

# The graph: undirected customer↔supplier edges from co-occurrence on an
# order (customer bought from supplier), deduplicated. Expressed once
# here and textually inlined into both engines' queries.
_EDGES_SQL = """
    SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def _pr_oracle() -> str:
    """Three unrolled PageRank iterations in plain SQL. Contributions are
    quantized to 1e-12 and summed as BIGINT so message-sum order can't
    perturb the ranks (PageRank sums are the textbook cross-engine
    nondeterminism trap)."""
    prelude = f"""
WITH edges0 AS ({_EDGES_SQL}),
edges AS (
    SELECT 'c' || CAST(cust AS VARCHAR) AS src, 's' || CAST(supp AS VARCHAR) AS dst FROM edges0
    UNION ALL
    SELECT 's' || CAST(supp AS VARCHAR), 'c' || CAST(cust AS VARCHAR) FROM edges0
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n_nodes FROM n) AS rank FROM nodes)
"""
    body = ""
    for i in range(_PR_ITERS):
        body += f""",
m{i} AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(floor(r.rank / d.outdeg * CAST({_PR_SCALE} AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS msum
    FROM edges e
    JOIN r{i} r ON r.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
),
r{i + 1} AS (
    SELECT nodes.node,
           (CAST(1.0 AS DOUBLE) - CAST({_PR_D} AS DOUBLE)) / (SELECT n_nodes FROM n)
             + CAST({_PR_D} AS DOUBLE)
               * (COALESCE(m{i}.msum, 0) / CAST({_PR_SCALE} AS DOUBLE)) AS rank
    FROM nodes LEFT JOIN m{i} ON m{i}.node = nodes.node
)
"""
    return (
        prelude
        + body
        + f"""
SELECT node, rank
FROM r{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT 25
"""
    )


@register("graph_pagerank", oracle=_pr_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (d=0.85, 3 iterations) over the
    undirected customer↔supplier purchase graph; top-25 nodes. The
    engine's iterative-algorithm template: per-iteration DataFrames with
    explicit persist(), quantized-exact message sums, rank join by node.

    Scale: the rank frame is |nodes|-sized and NEVER broadcast — on a
    billion-node graph a per-iteration broadcast of ranks is the classic
    iterative-graph OOM. Instead the loop is fully co-partitioned:
    edges are hash-partitioned on src ONCE (persisted with out-degree
    pre-joined — deg is static, so it costs one join total, not one per
    iteration), and each iteration's rank join rides that partitioning
    with a merge-hinted shuffle join (only the |nodes|-sized rank frame
    moves; the edge list never re-shuffles). The message sum groups on
    dst; the rank rebuild joins nodes⋈contrib, both already partitioned
    on node. persist() truncates what would otherwise be exponentially
    growing lineage — at real scale swap for localCheckpoint every ~5
    iterations. Message sums quantize each contribution to 1e-12 and
    add as BIGINT, so executor count and reduce order can never flip a
    rank comparison (bit-stable output — the property the oracle hash
    proves). Plan-gated: no broadcast of the rank frame
    (tests/test_plans.py::test_pagerank_never_broadcasts_ranks).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.repartition("src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # Static (src, dst, outdeg) adjacency — built once, partitioned by
    # src, reused every iteration.
    adj = (
        edges.join(deg.hint("merge"), edges.src == deg.node)
        .select("src", "dst", "outdeg")
        .persist()
    )
    n_nodes = nodes.count()  # driver-side scalar: iteration constant, O(1)
    # materialize adj now (one job), then drop the raw edge cache — the
    # loop and the returned plan read only adj and nodes, so holding the
    # un-joined edge copy for the whole session is pure dead weight. If
    # an adj block is later evicted it recomputes from parquet lineage.
    adj.count()
    edges.unpersist(blocking=False)
    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            adj.join(ranks.hint("merge"), adj.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("outdeg") * _PR_SCALE + 0.5)
                .cast("bigint")
                .alias("q"),
            )
            .groupBy("node")
            .agg(F.sum("q").alias("msum"))
        )
        ranks = (
            nodes.join(contrib.hint("merge"), "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - _PR_D) / n_nodes)
                    + _PR_D
                    * (F.coalesce(F.col("msum"), F.lit(0)) / F.lit(float(_PR_SCALE)))
                ).alias("rank"),
            )
            # no persist: each ranks frame is consumed exactly once (by the
            # next iteration), so caching would only add materialize cost;
            # at 10⁴+-iteration scale, localCheckpoint every ~5 to cut lineage
        )
    return ranks.orderBy(F.col("rank").desc(), "node").limit(25)
