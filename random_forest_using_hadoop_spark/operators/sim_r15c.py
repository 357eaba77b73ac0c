"""Round-15c similarity-search tier: binary (sign-bit) Hamming
embeddings and the composed IVF+PQ (coarse cells + asymmetric-distance
codes) search — the two remaining compression points on the public ANN
menu after exact cosine ([[sim_cosine_topk]]), LSH/IVF candidate
pruning ([[sim_ann_lsh]] / [[sim_ann_ivf]]) and flat PQ
([[emb_pq_codebook]] / [[emb_pq_adc_search]]).

Reference analog: none citable (the reference checkout is empty —
SURVEY.md §0); the algorithms are the standard public ones: binary
embedding by mean-threshold sign bits (Charikar hyperplane-style
sketches, packed-word Hamming via popcount), and IVF-ADC per Jégou et
al., "Product Quantization for Nearest Neighbor Search" (TPAMI 2011)
— here the non-residual variant (codes quantize raw vectors, the cell
only prunes) so the whole operator stays one relational plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.operators.llm_r15b import (
    _pq_bottomk_ids,
)
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

_HB_NQ = 5
_HB_TOPK = 10

_HAMMING_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
),
dims AS (
  SELECT vec_id, generate_subscripts(ve, 1) - 1 AS pos,
         CAST(floor(unnest(ve) * 1e9 + 0.5) AS BIGINT) AS vn
  FROM e
),
thr AS (
  SELECT pos,
         CAST(floor(CAST(CAST(SUM(vn) AS BIGINT) AS DOUBLE) / COUNT(*))
              AS BIGINT) AS t
  FROM dims GROUP BY pos
),
packed AS (
  SELECT d.vec_id,
         CAST(SUM(CASE WHEN d.pos < 32 AND d.vn > t.t
                       THEN (1::BIGINT << (d.pos % 32)) ELSE 0 END)
              AS BIGINT) AS p0,
         CAST(SUM(CASE WHEN d.pos >= 32 AND d.vn > t.t
                       THEN (1::BIGINT << (d.pos % 32)) ELSE 0 END)
              AS BIGINT) AS p1
  FROM dims d JOIN thr t USING (pos)
  GROUP BY d.vec_id
),
queries AS (
  SELECT vec_id AS q_id FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (
               ORDER BY md5('hb:' || CAST(vec_id AS VARCHAR)), vec_id
           ) AS qrn
    FROM e
  ) WHERE qrn <= {_HB_NQ}
),
scores AS (
  SELECT q.q_id, c.vec_id,
         bit_count(xor(c.p0, qp.p0)) + bit_count(xor(c.p1, qp.p1)) AS ham
  FROM queries q
  JOIN packed qp ON qp.vec_id = q.q_id
  JOIN packed c ON c.vec_id <> q.q_id
),
ham_topk AS (
  SELECT q_id, vec_id, ham FROM (
    SELECT q_id, vec_id, ham,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY ham, vec_id
           ) AS rn
    FROM scores
  ) WHERE rn <= {_HB_TOPK}
),
exact AS (
  SELECT q.q_id, d.vec_id,
         CAST(SUM(CAST(floor(
             (d.vn / 1e9 - qd.vn / 1e9) * (d.vn / 1e9 - qd.vn / 1e9) * 1e9
             + 0.5) AS BIGINT)) AS BIGINT) AS xd
  FROM queries q
  JOIN dims qd ON qd.vec_id = q.q_id
  JOIN dims d ON d.pos = qd.pos AND d.vec_id <> q.q_id
  GROUP BY q.q_id, d.vec_id
),
exact_topk AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY xd, vec_id
           ) AS rn
    FROM exact
  ) WHERE rn <= {_HB_TOPK}
)
SELECT h.q_id,
       CAST(SUM(h.ham) AS BIGINT) AS sum_hamming,
       CAST(COUNT(x.vec_id) AS BIGINT) AS n_recalled,
       CAST({_HB_TOPK} AS BIGINT) AS k
FROM ham_topk h
LEFT JOIN exact_topk x ON h.q_id = x.q_id AND h.vec_id = x.vec_id
GROUP BY h.q_id
"""


@register("sim_hamming_binary", oracle=_HAMMING_ORACLE)
def q_sim_hamming_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY EMBEDDINGS + HAMMING TOP-K: each 64-dim vector compresses
    to 64 SIGN BITS (1 iff the dimension exceeds its corpus mean),
    packed into two 32-bit words — 256 B → 8 B — and nearest-neighbor
    scoring becomes two XOR+popcount instructions per candidate. The
    graded output is, per hash-chosen query, the top-{topk} Hamming
    ranking's summed distance plus its RECALL against the exact
    nano-quantized L2 ranker — the quality-vs-compression trade
    binary sketches make, measured rather than asserted.

    Determinism: dimension values quantize to integer nanos BEFORE the
    mean threshold (floor of an exact-double division — Σ|vn| stays
    under 2^53 here; at true 100 TB scale the mean would come from the
    same fixed-point sum at BIGINT width), so every bit, every packed
    word, and every Hamming distance is the same integer in both
    engines; ties break by vec_id.

    Scale: thresholds are one 64-row map-combinable aggregate; packing
    is a groupBy emitting N 2-word rows; scoring joins the packed
    corpus against a {nq}-row BROADCAST query side — O(N) XORs with no
    shuffle of the corpus, and per-query TakeOrdered-style top-k. The
    64× memory cut is what lets a 1B-vector index live on one node.
    """.format(topk=_HB_TOPK, nq=_HB_NQ)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    )
    dims = e.select(
        "vec_id", F.posexplode("ve").alias("pos", "val")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("val") * 1e9 + F.lit(0.5)).cast("bigint").alias("vn"),
    )
    thr = dims.groupBy("pos").agg(
        F.floor(F.sum("vn").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("t")
    )
    word = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    packed = (
        dims.join(F.broadcast(thr), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when((F.col("pos") < 32) & (F.col("vn") > F.col("t")), word)
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("p0"),
            F.sum(
                F.when(
                    (F.col("pos") >= 32) & (F.col("vn") > F.col("t")), word
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("p1"),
        )
    )
    queries = _pq_bottomk_ids(e, "hb:", _HB_NQ).select(
        F.col("vec_id").alias("q_id")
    )
    qpacked = F.broadcast(
        queries.join(packed, queries.q_id == packed.vec_id).select(
            "q_id", F.col("p0").alias("q0"), F.col("p1").alias("q1")
        )
    )
    scores = (
        packed.crossJoin(qpacked)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.bit_count(F.expr("p0 ^ q0")) + F.bit_count(F.expr("p1 ^ q1"))
            ).alias("ham"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy("ham", "vec_id")
    ham_topk = (
        scores.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _HB_TOPK)
        .drop("rn")
    )
    # exact ranker (audit): nano-quantized L2 over the 5 query rows
    qdims = F.broadcast(
        queries.join(dims, queries.q_id == dims.vec_id).select(
            "q_id", "pos", F.col("vn").alias("qvn")
        )
    )
    exact = (
        dims.join(qdims, "pos")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            F.sum(
                F.floor(
                    (F.col("vn") / 1e9 - F.col("qvn") / 1e9)
                    * (F.col("vn") / 1e9 - F.col("qvn") / 1e9)
                    * 1e9
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("xd")
        )
    )
    wx = Window.partitionBy("q_id").orderBy("xd", "vec_id")
    exact_topk = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= _HB_TOPK)
        .select("q_id", F.col("vec_id").alias("x_vec"))
    )
    return (
        ham_topk.join(
            F.broadcast(exact_topk),
            (ham_topk.q_id == exact_topk.q_id)
            & (ham_topk.vec_id == exact_topk.x_vec),
            "left",
        )
        .groupBy(ham_topk.q_id)
        .agg(
            F.sum("ham").cast("bigint").alias("sum_hamming"),
            F.count("x_vec").cast("bigint").alias("n_recalled"),
            F.lit(_HB_TOPK).cast("bigint").alias("k"),
        )
    )


# --- IVF + PQ (coarse cells + asymmetric distance) ------------------------------

_IVF_KC = 8        # coarse centroids (cells)
_IVF_NPROBE = 2    # cells probed per query
_IVF_NQ = 5
_IVF_TOPK = 10
_IVF_SHORTLIST = 50  # ADC shortlist re-ranked exactly (the refine stage)
_IVFPQ_M = 8     # PQ subspaces (shared geometry with emb_pq_codebook)
_IVFPQ_K = 16    # PQ codes per subspace

_IVFPQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
),
dims AS (
  SELECT vec_id, generate_subscripts(ve, 1) - 1 AS pos, unnest(ve) AS val
  FROM e
),
coarse AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
             ORDER BY md5('ivfpq:' || CAST(vec_id AS VARCHAR)), vec_id
         ) - 1 AS cell
  FROM e
),
centdims AS (
  SELECT c.cell, d.pos, d.val AS cval
  FROM coarse c JOIN dims d USING (vec_id)
  WHERE c.cell < {_IVF_KC}
),
cell_dist AS (
  SELECT v.vec_id, c.cell,
         CAST(SUM(CAST(floor((v.val - c.cval) * (v.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS d
  FROM dims v JOIN centdims c ON v.pos = c.pos
  GROUP BY v.vec_id, c.cell
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY d, cell
           ) AS rn
    FROM cell_dist
  ) WHERE rn = 1
),
ranked AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
             ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id
         ) - 1 AS code
  FROM e
),
cdims AS (
  SELECT r.code, d.pos // 8 AS subspace, d.pos % 8 AS inner_i,
         d.val AS cval
  FROM ranked r JOIN dims d USING (vec_id)
  WHERE r.code < {_IVFPQ_K}
),
pqdist AS (
  SELECT v.vec_id, c.subspace, c.code,
         CAST(SUM(CAST(floor((v.val - c.cval) * (v.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS d
  FROM dims v
  JOIN cdims c ON v.pos // 8 = c.subspace AND v.pos % 8 = c.inner_i
  GROUP BY v.vec_id, c.subspace, c.code
),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (
               PARTITION BY vec_id, subspace ORDER BY d, code
           ) AS rn
    FROM pqdist
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS q_id FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (
               ORDER BY md5('q2:' || CAST(vec_id AS VARCHAR)), vec_id
           ) AS qrn
    FROM e
  ) WHERE qrn <= {_IVF_NQ}
),
probe AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, cd.cell,
           ROW_NUMBER() OVER (
               PARTITION BY q.q_id ORDER BY cd.d, cd.cell
           ) AS rn
    FROM queries q JOIN cell_dist cd ON cd.vec_id = q.q_id
  ) WHERE rn <= {_IVF_NPROBE}
),
cands AS (
  SELECT p.q_id, a.vec_id
  FROM probe p JOIN assigned a ON a.cell = p.cell
  WHERE a.vec_id <> p.q_id
),
lut AS (
  SELECT q.q_id, c.subspace, c.code,
         CAST(SUM(CAST(floor((d.val - c.cval) * (d.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS ld
  FROM queries q
  JOIN dims d ON d.vec_id = q.q_id
  JOIN cdims c ON d.pos // 8 = c.subspace AND d.pos % 8 = c.inner_i
  GROUP BY q.q_id, c.subspace, c.code
),
adc AS (
  SELECT ca.q_id, ca.vec_id, CAST(SUM(l.ld) AS BIGINT) AS ad
  FROM cands ca
  JOIN codes co ON co.vec_id = ca.vec_id
  JOIN lut l ON l.q_id = ca.q_id AND l.subspace = co.subspace
            AND l.code = co.code
  GROUP BY ca.q_id, ca.vec_id
),
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY ad, vec_id
           ) AS rn
    FROM adc
  ) WHERE rn <= {_IVF_SHORTLIST}
),
exact AS (
  SELECT q.q_id, d.vec_id,
         CAST(SUM(CAST(floor((d.val - qd.val) * (d.val - qd.val) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS xd
  FROM queries q
  JOIN dims qd ON qd.vec_id = q.q_id
  JOIN dims d ON d.pos = qd.pos AND d.vec_id <> q.q_id
  GROUP BY q.q_id, d.vec_id
),
refined AS (
  SELECT s.q_id, s.vec_id FROM (
    SELECT s.q_id, s.vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY s.q_id ORDER BY x.xd, s.vec_id
           ) AS rn
    FROM shortlist s
    JOIN exact x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
  ) s WHERE rn <= {_IVF_TOPK}
),
exact_topk AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY xd, vec_id
           ) AS rn
    FROM exact
  ) WHERE rn <= {_IVF_TOPK}
),
ncand AS (
  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM cands GROUP BY q_id
)
SELECT a.q_id, n.n_candidates,
       CAST(COUNT(x.vec_id) AS BIGINT) AS n_recalled,
       CAST({_IVF_TOPK} AS BIGINT) AS k
FROM refined a
JOIN ncand n ON n.q_id = a.q_id
LEFT JOIN exact_topk x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
GROUP BY a.q_id, n.n_candidates
"""


@register("sim_ann_ivfpq", oracle=_IVFPQ_ORACLE)
def q_sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ SEARCH with EXACT REFINE — the billion-scale ANN
    composition (Jégou 2011, non-residual variant, plus the FAISS-style
    refine stage): a COARSE quantizer of {kc} hash-sampled centroids
    partitions the corpus into cells; each query probes its {np}
    nearest cells, scores ONLY those cells' vectors by ASYMMETRIC
    DISTANCE over their 4-bit PQ codes (per-query lookup tables, never
    the raw vectors), keeps an ADC SHORTLIST of {sl}, and re-ranks the
    shortlist with exact distances — so PQ distortion only costs
    recall when the true neighbor falls off the shortlist entirely.
    Completes the tier: [[sim_ann_ivf]] prunes cells but scores raw
    vectors; [[emb_pq_adc_search]] scores codes but scans everything;
    this key does both — candidates AND memory are sublinear.

    Graded per query: candidate-set size (pins the cell assignment and
    probe choice), and top-{topk} recall against the full exact
    ranker — so a cell miss (the true neighbor living in an unprobed
    cell) is charged to recall, exactly as a production recall audit
    would (on this synthetic near-structureless corpus the measured
    recall ≈ the probed fraction, the information-theoretic ceiling).
    Same nano-quantization doctrine as the PQ keys: every distance,
    LUT entry, argmin, and tie-break is a deterministic BIGINT in
    both engines.

    Scale: cell assignment is a broadcast {kc}-centroid argmin; the
    probe step is {nq}×{np} rows; candidate generation is an equi-join
    on cell (the IVF point: no corpus-wide scoring); ADC scoring joins
    the candidates' {m}-code rows against a broadcast LUT and
    partial-aggs map-side. At 1B vectors with kc=16k cells the
    identical plan holds — the probed fraction, not N, sets the
    scoring cost.
    """.format(
        kc=_IVF_KC,
        np=_IVF_NPROBE,
        topk=_IVF_TOPK,
        nq=_IVF_NQ,
        m=_IVFPQ_M,
        sl=_IVF_SHORTLIST,
    )
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    )
    dims = e.select("vec_id", F.posexplode("ve").alias("pos", "val"))
    nano = lambda a, b: F.floor(  # noqa: E731 — shared quantizer
        (a - b) * (a - b) * 1e9 + F.lit(0.5)
    ).cast("bigint")

    # coarse quantizer: distances of every vector to the KC seed centroids
    centdims = F.broadcast(
        _pq_bottomk_ids(e, "ivfpq:", _IVF_KC)
        .select("vec_id", F.col("rk").alias("cell"))
        .join(dims, "vec_id")
        .select("cell", "pos", F.col("val").alias("cval"))
    )
    cell_dist = (
        dims.join(centdims, "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(nano(F.col("val"), F.col("cval"))).alias("d"))
    )
    wc = Window.partitionBy("vec_id").orderBy("d", "cell")
    assigned = (
        cell_dist.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )

    # PQ codes (same construction/seed as emb_pq_codebook)
    cdims = F.broadcast(
        _pq_bottomk_ids(e, "pq:", _IVFPQ_K)
        .select("vec_id", F.col("rk").alias("code"))
        .join(dims, "vec_id")
        .select(
            "code",
            (F.col("pos") / 8).cast("int").alias("subspace"),
            (F.col("pos") % 8).alias("inner_i"),
            F.col("val").alias("cval"),
        )
    )
    ddims = dims.withColumn(
        "subspace", (F.col("pos") / 8).cast("int")
    ).withColumn("inner_i", F.col("pos") % 8)
    pqdist = (
        ddims.join(cdims, ["subspace", "inner_i"])
        .groupBy("vec_id", "subspace", "code")
        .agg(F.sum(nano(F.col("val"), F.col("cval"))).alias("d"))
    )
    ws = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    codes = (
        pqdist.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select("vec_id", "subspace", "code")
    )

    queries = _pq_bottomk_ids(e, "q2:", _IVF_NQ).select(
        F.col("vec_id").alias("q_id")
    )
    # probe: each query's NPROBE nearest cells
    wp = Window.partitionBy("q_id").orderBy("d", "cell")
    probe = F.broadcast(
        queries.join(cell_dist, queries.q_id == cell_dist.vec_id)
        .select("q_id", "cell", "d")
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("q_id", "cell")
    )
    cands = (
        probe.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    # per-query LUT: exact subvector-to-codeword distances
    qdims = F.broadcast(
        queries.join(dims, queries.q_id == dims.vec_id).select(
            "q_id",
            (F.col("pos") / 8).cast("int").alias("subspace"),
            (F.col("pos") % 8).alias("inner_i"),
            F.col("val").alias("qval"),
        )
    )
    lut = F.broadcast(
        qdims.join(cdims, ["subspace", "inner_i"])
        .groupBy("q_id", "subspace", "code")
        .agg(F.sum(nano(F.col("qval"), F.col("cval"))).alias("ld"))
    )
    adc = (
        cands.join(codes, "vec_id")
        .join(lut, ["q_id", "subspace", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("ld").cast("bigint").alias("ad"))
    )
    wa = Window.partitionBy("q_id").orderBy("ad", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= _IVF_SHORTLIST)
        .select("q_id", "vec_id")
    )
    # exact ranker (shared by the refine stage and the recall audit;
    # a production refine would compute exact distances for the
    # shortlist ROWS ONLY — here the global frame doubles as the
    # audit's ground truth, and the optimizer prunes per use)
    qall = F.broadcast(
        queries.join(dims, queries.q_id == dims.vec_id).select(
            "q_id", "pos", F.col("val").alias("qval")
        )
    )
    exact = (
        dims.join(qall, "pos")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(nano(F.col("val"), F.col("qval"))).alias("xd"))
    )
    # refine: exact re-rank of the ADC shortlist (FAISS-style IVFPQR)
    wr = Window.partitionBy("q_id").orderBy("xd", "vec_id")
    refined = (
        shortlist.join(exact, ["q_id", "vec_id"])
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _IVF_TOPK)
        .select("q_id", "vec_id")
    )
    wx = Window.partitionBy("q_id").orderBy("xd", "vec_id")
    exact_topk = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= _IVF_TOPK)
        .select("q_id", F.col("vec_id").alias("x_vec"))
    )
    ncand = cands.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        refined.join(
            F.broadcast(exact_topk),
            (refined.q_id == exact_topk.q_id)
            & (refined.vec_id == exact_topk.x_vec),
            "left",
        )
        .groupBy(refined.q_id)
        .agg(F.count("x_vec").cast("bigint").alias("n_recalled"))
        .join(ncand, "q_id")
        .select(
            "q_id",
            "n_candidates",
            "n_recalled",
            F.lit(_IVF_TOPK).cast("bigint").alias("k"),
        )
    )
