"""Array / struct / map function families — SURVEY.md §2 B46–B47.

Dialect pins (measured on DuckDB 1.0): list_max(FLOAT[]) keeps FLOAT —
cast to DOUBLE before rounding; arr[1:3] is 1-based inclusive ≡ Spark
slice(arr,1,3); map extraction m['k'] returns a LIST — unwrap with [1]
on the oracle side (Spark element_at returns the scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B46: array functions ----------------------------------------------------

_B46_ORACLE = """
SELECT vec_id,
       len(embedding) AS n_dims,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim,
       round(sqrt(list_reduce(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (a, b) -> a + b)), 6) AS l2_norm,
       array_to_string(list_transform(embedding[1:3],
                         x -> format('{:.6f}', round(CAST(x AS DOUBLE), 6))),
                       ',') AS head3
FROM embeddings
"""


@register("fn_array", oracle=_B46_ORACLE)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: size/element_at/array_max/array_min/slice/transform/aggregate
    over the 64-dim embedding vectors.

    The fold in ``aggregate`` runs in array order — deterministic across
    engines (left fold both sides; 0.0+x ≡ x exactly). Note: norms are
    all 1.0 — the corpus embeddings are L2-normalized [data:embeddings].
    """
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    dbl = F.transform(arr, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(arr).alias("n_dims"),
        F.round(F.element_at(arr, 1).cast("double"), 6).alias("first_dim"),
        F.round(F.array_max(arr).cast("double"), 6).alias("max_dim"),
        F.round(F.array_min(arr).cast("double"), 6).alias("min_dim"),
        F.round(
            F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("l2_norm"),
        # Serialized, fixed-format: the driver's pandas canonicalizer
        # cannot hash array cells (r1 lesson) — emit a string, never a list.
        F.concat_ws(
            ",",
            F.transform(
                F.slice(arr, 1, 3),
                lambda x: F.format_string("%.6f", F.round(x.cast("double"), 6)),
            ),
        ).alias("head3"),
    )


# --- B47: struct + map functions ---------------------------------------------

_B47_ORACLE = """
SELECT doc_id,
       struct_pack(lang := lang, n_chars := n_chars).lang AS meta_lang,
       struct_pack(lang := lang, n_chars := n_chars).n_chars AS meta_chars,
       map([lang], [n_chars])[lang][1] AS lang_chars,
       map_from_entries([row('len', n_chars), row('id', doc_id)])['len'][1] AS m_len
FROM documents
"""


@register("fn_map_struct", oracle=_B47_ORACLE)
def q_fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: struct() pack + dot-project, create_map / map_from_entries +
    element access (scalar projections → SQL-comparable; DuckDB map
    extraction yields LIST, unwrapped with [1] in the oracle)."""
    d = load_table(spark, sf_dir, "documents")
    meta = F.struct(F.col("lang"), F.col("n_chars"))
    return d.select(
        "doc_id",
        meta.getField("lang").alias("meta_lang"),
        meta.getField("n_chars").alias("meta_chars"),
        F.element_at(F.create_map(F.col("lang"), F.col("n_chars")), F.col("lang")).alias(
            "lang_chars"
        ),
        F.element_at(
            F.map_from_entries(
                F.array(
                    F.struct(F.lit("len").alias("k"), F.col("n_chars").alias("v")),
                    F.struct(F.lit("id").alias("k"), F.col("doc_id").alias("v")),
                )
            ),
            "len",
        ).alias("m_len"),
    )
