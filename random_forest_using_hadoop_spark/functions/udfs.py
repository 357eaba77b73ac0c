"""UDF / UDAF / UDTF surface — SURVEY.md §2 B58–B61.

Reference analog [recon]: in MapReduce the mapper/reducer *is* the UDF
surface; here each flavor is re-expressed in its Spark-native form with
an SQL-formula oracle where the computation is SQL-expressible.

Scale doctrine: row-at-a-time Python UDFs (B58) are the documented slow
path — kept to demonstrate the API; real pipelines use the Arrow-batched
pandas forms (B59/B60) which amortize the JVM↔Python boundary per batch.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf, udtf

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B58: row-at-a-time scalar UDF -------------------------------------------

# Gini impurity of each language's source histogram — the reference's
# split criterion [recon], SQL-checkable as 1 - Σ (count/total)².
_B58_ORACLE = """
SELECT lang,
       ROUND(1.0 - SUM((CAST(n AS DOUBLE) / total) * (CAST(n AS DOUBLE) / total)), 6)
         AS gini
FROM (
  SELECT lang, source, COUNT(*) AS n,
         SUM(COUNT(*)) OVER (PARTITION BY lang) AS total
  FROM documents GROUP BY lang, source)
GROUP BY lang
"""


@udf(returnType=T.DoubleType())
def _gini_udf(counts: list[int]) -> float:
    total = sum(counts)
    return round(1.0 - math.fsum((c / total) ** 2 for c in counts), 6)


@register("udf_scalar", oracle=_B58_ORACLE)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58: Python scalar UDF computing gini impurity per language over
    its per-source counts (collected sorted for determinism)."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_source.groupBy("lang")
        .agg(F.sort_array(F.collect_list("n")).alias("counts"))
        .select("lang", _gini_udf("counts").alias("gini"))
    )


# --- B59: vectorized (Arrow) pandas UDF --------------------------------------

_QUERY_DIM = 64
# Deterministic pseudo-query vector: q[i] = sin(i+1), unit-normalized
# in the UDF / in SQL identically.
_B59_ORACLE = f"""
WITH q AS (
  SELECT list_transform(range(1, {_QUERY_DIM + 1}), i -> sin(CAST(i AS DOUBLE))) AS qv
),
qn AS (
  SELECT list_transform(qv, x -> x / sqrt(list_reduce(
           list_transform(qv, y -> y * y), (a, b) -> a + b))) AS qv
  FROM q
)
SELECT vec_id,
       ROUND(list_reduce(list_transform(range(1, {_QUERY_DIM + 1}),
               i -> CAST(embedding[i] AS DOUBLE) * qn.qv[i]), (a, b) -> a + b), 6)
         AS cos_sim
FROM embeddings, qn
"""


@register("udf_pandas", oracle=_B59_ORACLE)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B59: Arrow-batched pandas UDF — cosine of every embedding against
    a fixed query vector (embeddings are unit-norm, so cosine = dot;
    the query vector is unit-normalized on both sides).

    Scale: one Arrow batch per ~10k rows crosses the JVM↔Python
    boundary; numpy does the dot products vectorized.
    """
    import numpy as np

    qv = np.sin(np.arange(1, _QUERY_DIM + 1, dtype="float64"))
    qv = qv / math.sqrt(float((qv * qv).sum()))
    qv_list = [float(x) for x in qv]

    @pandas_udf("double")
    def cos_sim(emb: pd.Series) -> pd.Series:
        q = np.asarray(qv_list)
        # row-wise fold in array order to mirror the SQL list_reduce
        return emb.map(
            lambda v: round(math.fsum(float(a) * b for a, b in zip(v, q)), 6)
        )

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", cos_sim("embedding").alias("cos_sim"))


# --- B60: grouped-map UDAF (applyInPandas) -----------------------------------

_B60_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       ROUND(regr_slope(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS slope
FROM orders GROUP BY o_orderpriority
"""


@register("udaf_grouped", oracle=_B60_ORACLE)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B60: applyInPandas per-group OLS slope of totalprice on custkey —
    the Arrow grouped-map form of a custom aggregate (DuckDB
    ``regr_slope`` as the oracle formula)."""

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_custkey"].astype("float64")
        y = pdf["o_totalprice"].astype("float64")
        n = len(pdf)
        sx, sy = x.sum(), y.sum()
        sxy = float((x * y).sum())
        sxx = float((x * x).sum())
        s = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [n],
                "slope": [round(s, 6)],
            }
        )

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").applyInPandas(
        slope, schema="o_orderpriority string, n long, slope double"
    )


# --- B61: Python UDTF (Spark 4) ----------------------------------------------

_B61_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
"""


@register("udtf_explode", oracle=_B61_ORACLE)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B61: table-valued Python function — whitespace tokenizer emitting
    one row per token (DuckDB unnest(string_split) as oracle)."""

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                yield doc_id, tok

    d = load_table(spark, sf_dir, "documents")
    spark.udtf.register("rf_tokenize", Tokenize)
    d.createOrReplaceTempView("documents_b61")
    return spark.sql(
        "SELECT t.doc_id, t.token FROM documents_b61, "
        "LATERAL rf_tokenize(doc_id, text) t"
    )


# --- broadcast-variable lookup inside an Arrow UDF ----------------------------

_BCAST_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE event_type
                WHEN 'purchase' THEN 10 WHEN 'signup' THEN 5
                WHEN 'error' THEN -1 ELSE 1 END) AS BIGINT) AS score
FROM events
GROUP BY event_type
"""


@register("udf_broadcast_lookup", oracle=_BCAST_ORACLE)
def q_udf_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-data lookup via ``sc.broadcast`` inside a pandas UDF — the
    Spark form of the reference's DistributedCache model shipping
    [recon]: a driver-side table rides once per executor, and each Arrow
    batch maps against it in vectorized pandas.

    Scale: the broadcast is O(table) per executor, once — vs a join's
    shuffle or a per-row closure-capture re-pickle per task. This is the
    right shape for <100 MB reference tables (weights, vocab, geo maps);
    beyond that, use a broadcast JOIN so the optimizer can spill/plan.
    The SQL oracle inlines the lookup as a CASE — same semantics, which
    is exactly what the UDF must reproduce.
    """
    weights = {"purchase": 10, "signup": 5, "error": -1}
    bc = spark.sparkContext.broadcast(weights)

    @pandas_udf(T.LongType())
    def weight_of(event_type: pd.Series) -> pd.Series:
        return event_type.map(lambda t: bc.value.get(t, 1)).astype("int64")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("w", weight_of("event_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").cast("bigint").alias("score"),
        )
    )
