"""Similarity search over the embeddings table — SURVEY.md §2 C3/C4/C10
plus the embedding-cosine near-dup pass from the task spec.

Scale doctrine (100 TB): brute-force cosine is the *baseline* only, and
always broadcast-small-side × corpus — never corpus × corpus. The scale
paths are LSH (C4) and IVF (kmeans-partitioned probe), both of which
prune the candidate set before any exact math; exact verification then
runs only inside candidate buckets. All vector math is JVM-side
(``zip_with``/``aggregate`` fold in array order → deterministic and
engine-portable), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table
from random_forest_using_hadoop_spark.helpers import local_rows

N_QUERIES = 5
TOP_K = 10


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve"), "label"
    )


def _dot(a, b):
    """Left-fold dot product in array order — bit-identical to DuckDB's
    sequential list_inner_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# --- C3: exact top-k cosine (brute-force baseline) ---------------------------

_C3_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id,
         c.vec_id AS corpus_id,
         round(list_inner_product(q.ve, c.ve)
               / (sqrt(list_inner_product(q.ve, q.ve))
                  * sqrt(list_inner_product(c.ve, c.ve))), 6) AS cos_sim
  FROM v q JOIN v c ON c.vec_id >= {N_QUERIES}
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, corpus_id, cos_sim, rank_in_query
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id
  ) AS rank_in_query
  FROM pairs
)
WHERE rank_in_query <= {TOP_K}
"""


_TOPK_SALT = 32


def _scan_splits(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Driver-side estimate of a table scan's split count: file bytes /
    ``spark.sql.files.maxPartitionBytes``, from plain file metadata.

    This exists so plan-shape switches (salting in ``_topk_cut``) never
    call ``df.rdd.getNumPartitions()`` — the ``.rdd`` conversion forces
    an extra plan analysis per invocation, and its answer depends on
    whatever split layout the scan happened to pick, so the produced
    plan shape would vary with file-split accidents. Bytes-on-disk is
    deterministic in the input and free to read."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    else:
        total = os.path.getsize(path)
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    digits = "".join(ch for ch in str(raw) if ch.isdigit()) or "134217728"
    return max(1, -(-total // int(digits)))


def _topk_cut(pairs: DataFrame, salted: bool) -> DataFrame:
    """Rank (query_id, corpus_id, cos_sim) pairs and keep the top-k per
    query. `salted=True` is the scale path: phase 1 ranks within
    (query_id, corpus_id % SALT) so SALT·q tasks each sort n/SALT rows
    and keep k, phase 2 ranks only the surviving SALT·k·q rows — no
    q-partition global-sort hot spot. Same answer either way (top-k of
    per-salt top-ks is the global top-k), so callers may pick `salted`
    from any heuristic — including the _scan_splits estimate — without
    affecting results, only the plan shape."""
    order = (F.col("cos_sim").desc(), F.col("corpus_id"))
    if salted:
        w_salted = Window.partitionBy(
            "query_id", F.pmod(F.col("corpus_id"), F.lit(_TOPK_SALT))
        ).orderBy(*order)
        pairs = (
            pairs.withColumn("salt_rank", F.row_number().over(w_salted))
            .filter(F.col("salt_rank") <= TOP_K)
            .drop("salt_rank")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pairs.withColumn("rank_in_query", F.row_number().over(w))
        .filter(F.col("rank_in_query") <= TOP_K)
        .select("query_id", "corpus_id", "cos_sim", "rank_in_query")
    )


@register("sim_cosine_topk", oracle=_C3_ORACLE)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: exact top-k cosine neighbors for a small query set against the
    corpus, ranked on the *rounded* similarity with vec_id tiebreak so
    both engines cut the same top-k.

    Scale: queries are broadcast (small side); the corpus streams past
    once — no corpus×corpus shuffle. The top-k cut is salted two-phase
    (see _topk_cut) WHEN the corpus scan is wide enough for the
    q-partition sort to be the bottleneck; on a toy single-split corpus
    the salting windows would only add two exchanges for nothing (the r2
    bench measured +38% from exactly that), so the switch is the scan's
    estimated split count (file bytes / maxPartitionBytes, _scan_splits)
    vs the salt width — driver-side file metadata, no job, no .rdd
    conversion, deterministic in the input size.
    The plan gate (tests/test_plans.py::test_sim_topk_salted_two_phase)
    pins the salted shape on a wide input and the single-phase shape on
    the toy scan.
    """
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    c = v.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("corpus_id"), F.col("ve").alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    return _topk_cut(
        pairs, salted=_scan_splits(spark, sf_dir, "embeddings") > _TOPK_SALT
    )


# --- embedding-cosine near-dup pairs (task-spec dedup family) ----------------

_DEDUP_EMB_THRESHOLD = 0.35

_DEDUP_EMB_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
SELECT a.vec_id AS vec_id_a,
       b.vec_id AS vec_id_b,
       round(list_inner_product(a.ve, b.ve)
             / (sqrt(list_inner_product(a.ve, a.ve))
                * sqrt(list_inner_product(b.ve, b.ve))), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.ve, b.ve)
      / (sqrt(list_inner_product(a.ve, a.ve))
         * sqrt(list_inner_product(b.ve, b.ve))) >= {_DEDUP_EMB_THRESHOLD}
"""


_DEDUP_EMB_BLOCKS = 8      # block-grid floor (fixture scale)
_DEDUP_EMB_TARGET = 512    # target rows per block-pair group


@register("dedup_embedding", oracle=_DEDUP_EMB_ORACLE)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.35 — the corpus has
    no planted vector dups; max pairwise cos measured 0.513 at sf0.01, so
    the threshold sits where a few hundred pairs qualify).

    Scale (r9 rewrite): at this LOW threshold the candidate set is
    inherently dense — the bulk of the pairwise-cosine mass sits just
    below 0.35, so no metric hashing can separate 0.34 from 0.36, and
    the r2 MLlib `approxSimilarityJoin` plan (12 OR-ed BRP tables at
    recall 1.0) degenerated to all-pairs THROUGH the slow ML explode
    path: 235 s at 2,000 vectors, α≈4 per data decade (scaling_probe,
    r9). The n² verify is the workload here; the rewrite makes it cheap
    and evenly distributed instead of pretending to prune it:

    - block-pair grouping: each vector (home block b = vec_id mod T,
      T = 8) is replicated into the T groups {(min(b,k), max(b,k))},
      so every unordered pair of vectors meets in EXACTLY one of the
      T(T+1)/2 groups — replication ×T, no cartesian, no broadcast of
      the corpus, no driver collect;
    - per group, one BLAS matmul scores the (2n/T)² block and emits
      only the near-threshold candidates (slack 1e-3 ≫ matmul-vs-fold
      float noise, so the prune is lossless);
    - the JVM-side exact `_cosine` fold (bit-identical to the oracle's
      sequential list_inner_product) then decides each candidate, as in
      every other dedup verify stage. Python cost: one matmul per group.

    Per-task memory is (2n/T)·d doubles + at most (2n/T)² scores; T is
    derived from a driver-side count as ⌈2n / {_DEDUP_EMB_TARGET}⌉
    (floor {_DEDUP_EMB_BLOCKS}), i.e. T ∝ n, so per-group size — and
    hence per-task memory — is CONSTANT as the corpus grows (n=2k →
    T=8 ≈ 500-row groups, 2 MB of scores; the ×T replication is the
    unavoidable price of the n² score total, spread over T(T+1)/2
    constant-size tasks). Off-diagonal groups matmul only the
    unit[a]·unit[b]ᵀ cross block, not the full group×group matrix. At
    production thresholds (≥0.8) candidates ARE sparse and the LSH/IVF
    keys (sim_ann_*) own the subquadratic path.
    """
    import math

    import numpy as np
    import pandas as pd

    t = _DEDUP_EMB_THRESHOLD
    # NULL embeddings produce NULL cosines on both engines and never
    # reach the output; dropping them up front keeps numpy's stack dense
    v = _vectors(spark, sf_dir).filter(F.col("ve").isNotNull())
    # driver-side metadata count (one pass, like dist_row_number's
    # offsets job) sizes the block grid so per-task memory stays flat
    n = v.count()
    blocks = max(_DEDUP_EMB_BLOCKS, math.ceil(2 * n / _DEDUP_EMB_TARGET))

    def pair_prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        mat = np.asarray(pdf["ve"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm rows divide to non-finite scores; those pairs pass
        # the prune unconditionally so the exact JVM verify (same
        # expression as before this rewrite) decides them
        blk = pdf["blk"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            unit = mat / norms
            if gi == gj:
                ia, jb = np.triu_indices(len(ids), k=1)
                s = (unit @ unit.T)[ia, jb]
            else:
                # only the a×b cross block — the full group×group
                # matmul would spend ~2× the flops on scores the
                # diagonal groups already own
                a_idx = np.where(blk == gi)[0]
                b_idx = np.where(blk == gj)[0]
                s = (unit[a_idx] @ unit[b_idx].T).ravel()
                ii, jj = np.meshgrid(
                    a_idx, b_idx, indexing="ij"
                )  # row-major: matches s's ravel order
                ia, jb = ii.ravel(), jj.ravel()
        keep = (s >= t - 1e-3) | ~np.isfinite(s)
        ia, jb = ia[keep], jb[keep]
        return pd.DataFrame(
            {
                "vec_id_a": np.minimum(ids[ia], ids[jb]),
                "vec_id_b": np.maximum(ids[ia], ids[jb]),
            }
        )

    tagged = (
        v.withColumn("blk", F.pmod("vec_id", F.lit(blocks)).cast("int"))
        .select(
            "vec_id",
            "ve",
            "blk",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {blocks - 1}), k ->"
                    " struct(least(blk, k) as gi, greatest(blk, k) as gj))"
                )
            ).alias("g"),
        )
        .select("vec_id", "ve", "blk", "g.gi", "g.gj")
    )
    cand = tagged.groupBy("gi", "gj").applyInPandas(
        pair_prune, schema="vec_id_a long, vec_id_b long"
    )
    va = v.select(F.col("vec_id").alias("vec_id_a"), F.col("ve").alias("va"))
    vb = v.select(F.col("vec_id").alias("vec_id_b"), F.col("ve").alias("vb"))
    sim = _cosine(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "vec_id_a")
        .join(vb, "vec_id_b")
        .filter(sim >= t)
        .select("vec_id_a", "vec_id_b", F.round(sim, 6).alias("cos_sim"))
    )


# --- C4: approximate NN via random-projection LSH ----------------------------

_ANN_ORACLE = f"""
SELECT COUNT(*) AS n_queries,
       CAST({TOP_K} AS BIGINT) AS k,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
"""


def _recall_audit(spark: SparkSession, sf_dir: str, ann: DataFrame, floor: float) -> DataFrame:
    """Mean top-k recall of `ann` vs the exact ranker, computed entirely
    as a DataFrame plan — a LEFT OUTER join marks each truth pair the ANN
    found (non-null `hit`), then one agg averages per-query recall. NO
    driver collect: grading the ANN key costs one distributed pass over
    truth ∪ ann, not two materializations plus Python set math (the r2
    shape). At production scale `truth` is the same plan over a SAMPLED
    query subset — the audit shape is unchanged, only the query filter."""
    # ONE read of the exact ranker: left-join the ANN hits onto truth and
    # derive n_true/n_hit in a single agg (two branches off `truth` would
    # execute the expensive exact-ranker subtree twice). The .distinct()
    # makes the audit robust to ANN variants that emit a candidate pair
    # more than once — a duplicate would otherwise fan out its truth row
    # and inflate both the recall numerator and denominator.
    truth = q_sim_cosine_topk(spark, sf_dir).select("query_id", "corpus_id")
    marked = truth.join(
        ann.select("query_id", "corpus_id")
        .distinct()
        .withColumn("hit", F.lit(1)),
        ["query_id", "corpus_id"],
        "left",
    )
    per_q = marked.groupBy("query_id").agg(
        (F.count("hit") / F.count(F.lit(1))).alias("recall")
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg("recall") >= floor).alias("recall_ok"),
    ).select("n_queries", F.lit(TOP_K).cast("long").alias("k"), "recall_ok")


@register("sim_ann_lsh", oracle=_ANN_ORACLE)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: BucketedRandomProjectionLSH approximate neighbor join.

    Euclidean distance on L2-normalized vectors is monotone in cosine
    (d² = 2−2·cos), so a distance threshold is a cosine threshold. Seeded
    hyperplanes → deterministic buckets. Graded projection: mean top-k
    recall vs the exact ranker stays above 0.6 (the standard ANN quality
    gate, measured with margin at sf0.01).

    Scale: candidate generation is a bucket-key equi-join (shuffle ∝
    bucket collisions, not n²); numHashTables trades recall for shuffle.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    v = _vectors(spark, sf_dir).withColumn("vec", array_to_vector("ve"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(v)
    q = v.filter(F.col("vec_id") < N_QUERIES)
    c = v.filter(F.col("vec_id") >= N_QUERIES)
    joined = model.approxSimilarityJoin(q, c, 1.45, distCol="euclid_dist")
    w = Window.partitionBy("query_id").orderBy(
        F.col("euclid_dist").asc(), F.col("corpus_id")
    )
    ann = (
        joined.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("corpus_id"),
            F.round("euclid_dist", 6).alias("euclid_dist"),
        )
        .withColumn("rank_in_query", F.row_number().over(w))
        .filter(F.col("rank_in_query") <= TOP_K)
    )
    return _recall_audit(spark, sf_dir, ann, floor=0.6)


# --- IVF-style probe (kmeans-partitioned ANN) ---------------------------------


@register("sim_ann_ivf", oracle=_ANN_ORACLE)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means partitions the corpus into cells (the inverted
    file); each query probes its 4 nearest centroids and brute-forces
    only inside those cells. Graded projection: mean top-k recall vs the
    exact ranker ≥ 0.6 (0.78 measured at sf0.01; seeded kmeans).

    Scale: the index assignment is one MLlib transform; the probe join is
    an equi-join on cell id, so per-query work ∝ corpus/k × nprobe. The
    centroid table is tiny and broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    k, nprobe = 8, 4  # nprobe=4 → mean recall 0.78 at sf0.01 (floor 0.6)
    v = _vectors(spark, sf_dir).withColumn("vec", array_to_vector("ve"))
    km = KMeans(k=k, seed=42, featuresCol="vec", predictionCol="cell")
    model = km.fit(v)
    corpus = model.transform(v.filter(F.col("vec_id") >= N_QUERIES)).select(
        F.col("vec_id").alias("corpus_id"), F.col("ve").alias("cv"), "cell"
    )
    centroids = local_rows(spark, 
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        schema="cell int, centroid array<double>",
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    # pick each query's nprobe nearest cells (centroid table is tiny)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "cell",
        _cosine(F.col("qv"), F.col("centroid")).alias("c_sim"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("cell")
    )
    probed = (
        qc.withColumn("c_rank", F.row_number().over(wc))
        .filter(F.col("c_rank") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    pairs = probed.join(corpus, "cell").select(
        "query_id",
        "corpus_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id")
    )
    ann = (
        pairs.withColumn("rank_in_query", F.row_number().over(w))
        .filter(F.col("rank_in_query") <= TOP_K)
    )
    return _recall_audit(spark, sf_dir, ann, floor=0.6)


# --- C10: per-label centroid + dispersion ------------------------------------

# All float aggregation is fixed-point (SURVEY §2 determinism rules):
# per-dim sums quantized at 1e6, squared sums at 1e12, per-dim variances
# re-quantized at 1e12 before the cross-dim sum — every aggregate is an
# integer sum, so accumulation order can't shift the hash.
_C10_ORACLE = """
WITH d AS (
  SELECT label, t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) t(i)
),
per_dim AS (
  SELECT label, dim,
         CAST(SUM(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(floor(x * x * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss,
         COUNT(*) AS n
  FROM d GROUP BY label, dim
),
per_dim_var AS (
  SELECT label, dim, n,
         ss / 1000000000000.0 / n
           - (s / 1000000.0 / n) * (s / 1000000.0 / n) AS var_d,
         s / 1000000.0 / n AS mean_d
  FROM per_dim
)
SELECT label,
       MAX(n) AS n_vectors,
       CAST(SUM(CAST(floor(var_d * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         / 1000000000000.0 AS dispersion,
       round(MAX(CASE WHEN dim = 1 THEN mean_d END), 6) AS centroid_d1,
       round(MAX(CASE WHEN dim = 2 THEN mean_d END), 6) AS centroid_d2
FROM per_dim_var
GROUP BY label
"""


@register("emb_cluster_stats", oracle=_C10_ORACLE)
def q_emb_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: per-label centroid dims + intra-class dispersion, where
    dispersion = Σ_d var_pop(dim d) = E‖x−μ‖² per class.

    Scale: posexplode multiplies rows ×64 but the per-(label,dim) partial
    agg combines map-side, so shuffle ∝ labels×dims. One pass, no joins.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label", (F.col("pos") + 1).alias("dim"), F.col("col").alias("x")
    )
    x = F.col("x")
    per_dim = d.groupBy("label", "dim").agg(
        F.sum(F.floor(x * 1e6 + 0.5).cast("bigint")).alias("s"),
        F.sum(F.floor(x * x * 1e12 + 0.5).cast("bigint")).alias("ss"),
        F.count("*").alias("n"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    per_dim_var = per_dim.select(
        "label",
        "dim",
        "n",
        (ss / 1e12 / n - (s / 1e6 / n) * (s / 1e6 / n)).alias("var_d"),
        (s / 1e6 / n).alias("mean_d"),
    )
    return per_dim_var.groupBy("label").agg(
        F.max("n").alias("n_vectors"),
        (
            F.sum(F.floor(F.col("var_d") * 1e12 + 0.5).cast("bigint")) / 1e12
        ).alias("dispersion"),
        F.round(
            F.max(F.when(F.col("dim") == 1, F.col("mean_d"))), 6
        ).alias("centroid_d1"),
        F.round(
            F.max(F.when(F.col("dim") == 2, F.col("mean_d"))), 6
        ).alias("centroid_d2"),
    )


# --- scale-path retrieval: Arrow-batched matmul prune + exact re-rank --------


@register("sim_query_topk", oracle=_C3_ORACLE)
def q_sim_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-set top-k retrieval, the 100 TB serving shape: an
    Arrow-batched numpy matmul prunes each corpus batch down to a
    per-query candidate slate, then the JVM-side exact fold re-ranks
    only the candidates. Must reproduce sim_cosine_topk's brute-force
    answer bit-for-bit (same oracle) — prune + exact re-rank is lossless
    because the candidate margin dwarfs float noise.

    Scale: the window's shuffle input is candidates (partitions × q ×
    margin), not the n×q scored stream that sim_cosine_topk ships — at a
    billion corpus rows that is the difference between a top-k and an
    impossible sort. Python cost is one BLAS matmul per Arrow batch.
    """
    import numpy as np
    import pandas as pd

    v = _vectors(spark, sf_dir)
    q_rows = v.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "ve").collect()
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r.ve) for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    margin = TOP_K + 8  # absorbs matmul-vs-fold last-ulp rank jitter

    def prune(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.array(pdf["ve"].tolist(), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ q_mat.T  # batch_rows × n_queries
            k = min(margin, len(pdf))
            idx = np.argpartition(-sims, k - 1, axis=0)[:k]
            cid = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, k),
                    "corpus_id": np.concatenate(
                        [cid[idx[:, j]] for j in range(len(q_ids))]
                    ),
                }
            )

    corpus = v.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("corpus_id"), F.col("ve").alias("cv")
    )
    cand = corpus.select(
        F.col("corpus_id").alias("vec_id"), F.col("cv").alias("ve")
    ).mapInPandas(prune, schema="query_id long, corpus_id long")
    q_df = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    scored = (
        cand.join(corpus, "corpus_id")
        .join(F.broadcast(q_df), "query_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank_in_query", F.row_number().over(w))
        .filter(F.col("rank_in_query") <= TOP_K)
        .select("query_id", "corpus_id", "cos_sim", "rank_in_query")
    )


# --- int8 vector quantization with reconstruction-error audit ----------------

# Per-vector symmetric int8: scale = 127/max|x|, q = floor(x*scale + .5)
# (round-half-toward-+inf, written identically in both engines so the
# reconstruction is bit-for-bit comparable). The per-vector folds run in
# array order on both sides; only the cross-vector mean goes through the
# fixed-point policy.
_QUANT_ORACLE = """
WITH v AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
),
q AS (
  SELECT label,
         len(ve) AS dim,
         sqrt(list_aggregate(
             list_transform(ve, x ->
                 pow(x - floor(x * (127e0 / list_aggregate(
                         list_transform(ve, y -> abs(y)), 'max'))
                     + 5e-1)
                     / (127e0 / list_aggregate(
                         list_transform(ve, y -> abs(y)), 'max')), 2)),
             'sum') / len(ve)) AS rmse
  FROM v
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(floor(rmse * 1e9 + 5e-1) AS BIGINT)) AS BIGINT) / 1e9
         AS mean_rmse_sum
FROM q
GROUP BY label
"""


@register("emb_quantize", oracle=_QUANT_ORACLE)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of the embedding column with a
    per-label reconstruction-error (RMSE) audit — the compression step
    that makes a billion-vector ANN index fit in executor memory (4×
    smaller than float32, 8× than float64).

    Scale: stateless per-row array math, entirely JVM-side (transform/
    aggregate fold), then one hash agg on the 10-value label key. The
    audit is how a pipeline decides quantization is safe before
    swapping the serving index. Errors are quantized at 1e-9 before the
    cross-vector sum so the mean is accumulation-order-free.
    """
    v = _vectors(spark, sf_dir)
    amax = F.aggregate(
        F.transform(F.col("ve"), lambda y: F.abs(y)),
        F.lit(0.0),
        lambda acc, y: F.greatest(acc, y),
    )
    scale = F.lit(127.0) / amax
    err_sq = F.transform(
        F.col("ve"),
        lambda x: F.pow(x - F.floor(x * scale + F.lit(0.5)) / scale, F.lit(2.0)),
    )
    rmse = F.sqrt(
        F.aggregate(err_sq, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(F.col("ve"))
    )
    return (
        v.select("label", rmse.alias("rmse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.sum(F.floor(F.col("rmse") * 1e9 + 0.5).cast("bigint"))
                / F.lit(1e9)
            ).alias("mean_rmse_sum"),
        )
    )


# --- random-projection dimensionality reduction (Achlioptas signs) -----------

_RP_IN, _RP_OUT = 64, 16


def _rp_signs() -> list[list[float]]:
    """±1 projection matrix, seeded per-cell from md5(i_j) — a
    database-friendly random projection (Achlioptas, PODS'01): sign
    matrices satisfy the Johnson-Lindenstrauss bound while needing only
    additions. Deriving each cell from a content hash makes the matrix
    a deterministic CONSTANT both engines embed literally, so the
    oracle recomputes the projection with the identical arithmetic."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:4], 16) % 2 == 0
            else -1.0
            for i in range(_RP_IN)
        ]
        for j in range(_RP_OUT)
    ]


def _rp_oracle() -> str:
    import math

    signs = _rp_signs()
    scale = 1.0 / math.sqrt(_RP_OUT)
    rows = [
        f"list_inner_product(ve, {signs[j]}) * {scale!r}" for j in range(_RP_OUT)
    ]
    norm_sq = " + ".join(f"p{j} * p{j}" for j in range(_RP_OUT))
    proj_cols = ",\n  ".join(f"{rows[j]} AS p{j}" for j in range(_RP_OUT))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
p AS (SELECT vec_id, ve,
  {proj_cols}
  FROM v)
SELECT vec_id,
       round(p0, 6) AS p0, round(p1, 6) AS p1,
       round(p2, 6) AS p2, round(p3, 6) AS p3,
       round(sqrt({norm_sq}) / sqrt(list_inner_product(ve, ve)), 6)
         AS norm_ratio
FROM p
"""


@register("emb_random_projection", oracle=_rp_oracle())
def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 → 16 with an
    Achlioptas ±1 sign matrix — the cheap pre-pass that shrinks
    embedding payloads before ANN indexing or clustering at corpus
    scale. Grades the first four projected coordinates exactly plus the
    norm ratio computed over ALL 16 (so every output dimension must be
    right, not just the four shown).

    Scale: the matrix is a compile-time constant folded into the plan
    (no broadcast, no shuffle); each row costs 16 sign-folded dot
    products inside whole-stage codegen, so the pass is scan-bound and
    embarrassingly parallel — the correct shape for a 100 TB embedding
    sweep. The fold order matches DuckDB's sequential
    list_inner_product, keeping every double bit-identical.
    """
    import math

    signs = _rp_signs()
    scale = 1.0 / math.sqrt(_RP_OUT)
    v = _vectors(spark, sf_dir)
    projected = v.select(
        "vec_id",
        "ve",
        *[
            (
                _dot(
                    F.col("ve"),
                    F.array(*[F.lit(s) for s in signs[j]]),
                )
                * scale
            ).alias(f"p{j}")
            for j in range(_RP_OUT)
        ],
    )
    norm_sq = sum(
        (F.col(f"p{j}") * F.col(f"p{j}") for j in range(1, _RP_OUT)),
        F.col("p0") * F.col("p0"),
    )
    return projected.select(
        "vec_id",
        F.round("p0", 6).alias("p0"),
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round("p3", 6).alias("p3"),
        F.round(
            F.sqrt(norm_sq) / F.sqrt(_dot(F.col("ve"), F.col("ve"))), 6
        ).alias("norm_ratio"),
    )


# --- embedding drift between corpus halves -----------------------------------

_DRIFT_ORACLE = """
WITH e AS (
  SELECT label, vec_id % 2 AS cohort,
         generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding) * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM embeddings
),
m AS (
  SELECT label, cohort, dim,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_v
  FROM e GROUP BY label, cohort, dim
),
d AS (
  SELECT a.label, a.dim, (a.mean_v - b.mean_v) AS delta
  FROM m a JOIN m b
    ON a.label = b.label AND a.dim = b.dim
   AND a.cohort = 0 AND b.cohort = 1
)
SELECT label, round(sqrt(SUM(delta * delta)), 6) AS centroid_shift
FROM d GROUP BY label
"""


@register("emb_drift_monitor", oracle=_DRIFT_ORACLE)
def q_emb_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label L2 distance between the
    centroids of two deterministic corpus halves (vec_id parity
    standing in for before/after snapshots) — the "did the encoder or
    the data move" check an embedding pipeline runs per refresh.

    Per-dimension means come from fixed-point integer sums (float32
    inputs quantized at 1e6), so each cohort centroid is exact; only
    the final 64-term sum of squared deltas is float math, identical
    on both engines per-label.

    Scale: posexplode fans rows ×dim but the (label, cohort, dim)
    partial agg collapses map-side to |labels|×2×64 rows — the join
    and distance run on that tiny frame. Same doctrine as
    emb_cluster_stats (similarity.py) extended with the cohort axis.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
    )
    m = (
        e.groupBy("label", "cohort", (F.col("dim0") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.floor(F.col("x") * 1000000.0 + 0.5).cast("bigint")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / 1000000.0
            ).alias("mean_v")
        )
    )
    a = m.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("mean_v").alias("ma")
    )
    b = m.filter(F.col("cohort") == 1).select(
        "label", "dim", F.col("mean_v").alias("mb")
    )
    d = a.join(b, ["label", "dim"]).select(
        "label", (F.col("ma") - F.col("mb")).alias("delta")
    )
    return d.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("delta") * F.col("delta"))), 6).alias(
            "centroid_shift"
        )
    )


# --- SemDeDup: semantic dedup inside coarse embedding clusters -------------------

_SEMDEDUP_K_MIN = 8   # cell-count floor (micro corpora)
_SEMDEDUP_TAU = 0.30  # within-cell cosine duplicate threshold

# K = max(8, ceil(sqrt(n/2))) balances the quantizer's two cost terms —
# assignment is n·K dot products, within-cell pairing is ~n·(n/K)/2 —
# at K = sqrt(n/2) both are n^1.5 (the best an EXACT one-level SemDeDup
# can do; see the docstring for the 100 TB two-level path)
_SEMDEDUP_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
kk AS (SELECT GREATEST({_SEMDEDUP_K_MIN},
                       CAST(CEIL(SQRT(COUNT(*) / 2.0)) AS BIGINT))
              AS k FROM v),
c AS (SELECT vec_id AS cid, ve AS ce FROM v, kk WHERE vec_id < kk.k),
corpus AS (SELECT v.* FROM v, kk WHERE v.vec_id >= kk.k),
pairs AS (
  SELECT corpus.vec_id, corpus.ve, c.cid,
         list_inner_product(corpus.ve, corpus.ve)
           - 2.0 * list_inner_product(corpus.ve, c.ce)
           + list_inner_product(c.ce, c.ce) AS dist2
  FROM corpus JOIN c ON TRUE
),
assigned AS (
  SELECT vec_id, ve, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cid) AS rk
    FROM pairs
  ) WHERE rk = 1
),
dup AS (
  SELECT a.cid, a.vec_id AS ka, b.vec_id AS kb
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.ve, b.ve)
        / (sqrt(list_inner_product(a.ve, a.ve))
           * sqrt(list_inner_product(b.ve, b.ve))) >= {_SEMDEDUP_TAU}
),
pop AS (SELECT cid, COUNT(*) AS n_assigned FROM assigned GROUP BY cid),
dp  AS (SELECT cid, COUNT(*) AS n_pairs    FROM dup      GROUP BY cid),
rem AS (SELECT cid, COUNT(DISTINCT kb) AS n_removed FROM dup GROUP BY cid)
SELECT c.cid AS centroid_id,
       CAST(COALESCE(pop.n_assigned, 0) AS BIGINT) AS n_assigned,
       CAST(COALESCE(dp.n_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(rem.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(pop.n_assigned, 0) - COALESCE(rem.n_removed, 0)
            AS BIGINT) AS n_kept
FROM c
LEFT JOIN pop USING (cid)
LEFT JOIN dp  USING (cid)
LEFT JOIN rem USING (cid)
"""


@register("dedup_semantic", oracle=_SEMDEDUP_ORACLE)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with a coarse quantizer,
    then find near-duplicates ONLY within each cluster — the published
    recipe that removed ~50% of LAION/C4 at minimal quality cost, and
    the missing tier between exact/minhash dedup (surface overlap) and
    nothing: paraphrases and re-encodes share no n-grams but sit at
    high embedding cosine.

    Pipeline (each stage a graded column): assign every corpus vector
    to its nearest of K seed centroids (squared-L2, centroid-id
    tie-break — the [[q_sim_centroid_assign]] pass), pair vectors
    WITHIN a cell at cosine ≥ {_SEMDEDUP_TAU}, and keep one canonical
    representative per duplicate relation (drop any vector with a
    lower-id near-dup — the same survivor rule as
    [[q_dedup_canonical_keep]]). Output per cell: population, dup
    pairs, removed, kept.

    Scale: assignment is a K-row broadcast + per-vector argmin (one
    shuffle); the pair stage is an EQUI-JOIN on the cell id — the
    whole point of SemDeDup's clustering is that the quadratic term is
    per-cell. K = ⌈sqrt(n/2)⌉ balances the two cost terms (assignment
    n·K vs pairing n²/(2K)) at n^1.5 total — the best an EXACT
    one-level quantizer can do (probe: raw 10×-step 2.25, α≈1.76). At
    100 TB the assignment side drops to the two-level ANN path the
    engine already grades (sim_ann_ivf's coarse cells + nprobe) and K
    follows the paper's fixed 50k with per-cell matmuls — the pair
    stage's equi-join shape is unchanged. No cross-cell pair is ever
    formed; cosine is the JVM-side fold, bit-identical to the oracle's
    sequential list_inner_product."""
    import math

    v = _vectors(spark, sf_dir)
    # K grows with the corpus (one driver-side metadata count, like
    # dedup_embedding's block grid) at the balance point of the two
    # cost terms — see the _SEMDEDUP_ORACLE comment
    k = max(_SEMDEDUP_K_MIN, math.ceil(math.sqrt(v.count() / 2.0)))
    # per-side invariants are computed ONCE per vector, not once per
    # (vector, centroid) pair / per pair: |c|² rides the broadcast
    # centroid table, |v|² and the norm ride the corpus row. The fold
    # that produces each term and the combining expression's operation
    # order are unchanged, so every double is bit-identical to the r15
    # per-pair recomputation (IEEE determinism), at a third of the
    # lambda-fold work in the two quadratic stages.
    c = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        F.col("ve").alias("ce"),
        _dot(F.col("ve"), F.col("ve")).alias("cc"),
    )
    corpus = v.filter(F.col("vec_id") >= k).select(
        "vec_id",
        "ve",
        _dot(F.col("ve"), F.col("ve")).alias("vv"),
        F.sqrt(_dot(F.col("ve"), F.col("ve"))).alias("nv"),
    )
    dist2 = F.col("vv") - 2.0 * _dot(F.col("ve"), F.col("ce")) + F.col("cc")
    scored = corpus.join(F.broadcast(c)).select(
        "vec_id", "ve", "nv", "cid", dist2.alias("dist2")
    )
    assigned = (
        # argmin as ONE hash aggregate (map-side partial) instead of a
        # sort-window pass: min over struct(dist2, cid, …) picks the
        # same row as row_number over (dist2 ASC, cid ASC) — cid is
        # unique within a vec_id group, so the trailing fields never
        # participate in the comparison
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist2", "cid", "ve", "nv")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"),
                F.col("m.ve").alias("ve"), F.col("m.nv").alias("nv"))
        # materialize ONCE: four downstream consumers (both pair
        # sides, the population agg, the spine join) would otherwise
        # each replay the n·K assignment pass — the same pattern as
        # graph_bfs_hops' frontier
        .localCheckpoint()
    )
    a = assigned.select(
        F.col("cid"), F.col("vec_id").alias("ka"),
        F.col("ve").alias("va"), F.col("nv").alias("na"),
    )
    b = assigned.select(
        F.col("cid"), F.col("vec_id").alias("kb"),
        F.col("ve").alias("vb"), F.col("nv").alias("nb"),
    )
    dup = (
        a.join(b, "cid")
        .filter(F.col("ka") < F.col("kb"))
        .filter(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select("cid", "ka", "kb")
    )
    pop = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned")
    )
    dp = dup.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs")
    )
    rem = dup.groupBy("cid").agg(
        F.countDistinct("kb").cast("bigint").alias("n_removed")
    )
    z = F.lit(0).cast("bigint")
    return (
        c.select(F.col("cid"))
        .join(pop, "cid", "left")
        .join(dp, "cid", "left")
        .join(rem, "cid", "left")
        .select(
            F.col("cid").alias("centroid_id"),
            F.coalesce("n_assigned", z).alias("n_assigned"),
            F.coalesce("n_dup_pairs", z).alias("n_dup_pairs"),
            F.coalesce("n_removed", z).alias("n_removed"),
            (
                F.coalesce("n_assigned", z) - F.coalesce("n_removed", z)
            ).cast("bigint").alias("n_kept"),
        )
    )
