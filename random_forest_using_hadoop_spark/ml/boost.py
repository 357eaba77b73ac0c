"""Tier-A extensions beyond the reference's random forest: gradient-
boosted trees (the other canonical tree ensemble — sequential boosting
vs the forest's parallel bagging) and k-means clustering, both on
Spark MLlib over the shared embedding features.

Reference analog: none citable (the reference checkout is empty —
SURVEY.md §0); these extend the Tier-A family the same way the
similarity tier extends Tier C.

Grading model (the ml/forest.py doctrine): MLlib's internals are not
bit-portable across engines, so the oracles pin EXACT structural
facts (ensemble size, row counts, domain bounds) plus wide-margin
learnability/consistency booleans — never floating model internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.ml.forest import SEED, assemble
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table
from random_forest_using_hadoop_spark.helpers import local_rows

_GBT_ITERS = 10
_GBT_DEPTH = 4

_GBT_ORACLE = f"""
SELECT CAST({_GBT_ITERS} AS INTEGER) AS num_trees,
       COUNT(*) AS n_total,
       TRUE AS forest_grew,
       TRUE AS importances_normalized,
       TRUE AS acc_sane
FROM embeddings
"""


@register("ml_gbt_binary", oracle=_GBT_ORACLE)
def q_ml_gbt_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADIENT-BOOSTED TREES (binary): {it} boosting iterations of
    depth-{d} trees on the parity target label % 2, seed {seed} — the
    sequential-ensemble counterpart to [[ml_rf_train]]'s bagging
    (boosting fits each tree to the previous ensemble's residuals, so
    iterations CANNOT parallelize across trees; MLlib parallelizes
    WITHIN each tree's histogram aggregation instead, which is the
    scale story at 100 TB: per-iteration cost is one distributed
    pass, iterations are the serial budget you tune).

    Graded (structure + invariants, per the Tier-A doctrine): the
    ensemble size is exactly the iteration count, the trees really
    split (total nodes > trees), feature importances form a
    probability vector (Σ=1 within 1e-6), and held-out accuracy is
    sane (> 0.40 on a binary target — the parity label carries weak
    signal on this synthetic corpus, measured 0.55; the wide margin
    keeps split-partitioning jitter out of the grade).
    """.format(it=_GBT_ITERS, d=_GBT_DEPTH, seed=SEED)
    from pyspark.ml.classification import GBTClassifier

    data = assemble(load_table(spark, sf_dir, "embeddings")).withColumn(
        "blabel", (F.col("label") % 2).cast("double")
    )
    train, test = data.randomSplit([0.8, 0.2], seed=SEED)
    model = GBTClassifier(
        labelCol="blabel",
        maxIter=_GBT_ITERS,
        maxDepth=_GBT_DEPTH,
        seed=SEED,
    ).fit(train)
    acc = (
        model.transform(test)
        .agg(
            F.avg((F.col("blabel") == F.col("prediction")).cast("double"))
        )
        .first()[0]
    )
    n_total = load_table(spark, sf_dir, "embeddings").count()
    imp_sum = float(sum(model.featureImportances.toArray()))
    return local_rows(spark, 
        [
            (
                model.getNumTrees,
                n_total,
                model.totalNumNodes > model.getNumTrees,
                abs(imp_sum - 1.0) < 1e-6,
                acc > 0.40,
            )
        ],
        "num_trees int, n_total long, forest_grew boolean, "
        "importances_normalized boolean, acc_sane boolean",
    )


_KM_K = 8

_KM_ORACLE = f"""
SELECT CAST({_KM_K} AS INTEGER) AS k,
       COUNT(*) AS n_total,
       TRUE AS sizes_cover_all,
       TRUE AS improved_over_one_cluster,
       TRUE AS centers_have_dim
FROM embeddings
"""


@register("ml_kmeans_cluster", oracle=_KM_ORACLE)
def q_ml_kmeans_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS over the embedding corpus (k={k}, seed {seed},
    k-means|| init) — the iterative-refinement centroid learner beside
    the engine's one-shot quantizers ([[sim_centroid_assign]] /
    [[emb_pq_codebook]] build codebooks from hash-sampled anchors;
    k-means actually descends the distortion objective, at the cost
    of maxIter distributed passes).

    Graded invariants (cluster geometry is partitioning-sensitive, so
    no centroid coordinates): k is exact, the cluster sizes sum to
    the corpus (every vector assigned exactly once), the trained
    distortion strictly beats the k=1 baseline (Σ per-dim variance —
    computed as one exact aggregate; if the iterations did nothing
    the model would tie the baseline), and the centers carry the full
    64-dim arity.

    Scale: each iteration is one map-combinable assignment pass +
    a k×dim reduce — the canonical Lloyd-on-MapReduce shape; k-means||
    seeding bounds the init to O(log n) passes.
    """.format(k=_KM_K, seed=SEED)
    from pyspark.ml.clustering import KMeans

    data = assemble(load_table(spark, sf_dir, "embeddings")).cache()
    model = KMeans(k=_KM_K, seed=SEED, maxIter=10).fit(data)
    sizes = model.summary.clusterSizes
    cost = model.summary.trainingCost
    n_total = data.count()
    # k=1 baseline: total squared distance to the global mean =
    # Σ_dims (Σx² − (Σx)²/n), one exact aggregate over the dims
    dims = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("pos", "v")
    )
    base = (
        dims.groupBy("pos")
        .agg(
            (
                F.sum(F.col("v") * F.col("v"))
                - F.sum("v") * F.sum("v") / F.count(F.lit(1))
            ).alias("ss")
        )
        .agg(F.sum("ss"))
        .first()[0]
    )
    data.unpersist()
    return local_rows(spark, 
        [
            (
                len(sizes),
                n_total,
                sum(sizes) == n_total,
                cost < base,
                len(model.clusterCenters()[0]) == 64,
            )
        ],
        "k int, n_total long, sizes_cover_all boolean, "
        "improved_over_one_cluster boolean, centers_have_dim boolean",
    )
