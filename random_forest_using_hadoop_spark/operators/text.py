"""Text-analysis / dedup operators over the documents corpus —
SURVEY.md §2 C1 (exact dedup), C6–C8 (corpus stats, normalization,
quality filter). The LSH near-dup path (C2) lives in dedup_lsh.py.

Scale doctrine: everything here is hash-groupBy or stateless projection
— shuffle volume ∝ #distinct hashes, and the normalization/quality
passes are pure codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- C1: exact dedup by content hash -----------------------------------------

_C1_ORACLE = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


@register("dedup_exact", oracle=_C1_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact dedup — hash-groupBy on md5(text), keeping the lowest
    doc_id per content group (8 exact dups exist at sf0.1 [FIXTURES]).

    Scale: the map side hashes each doc once; only (hash, id) pairs
    shuffle — never the text payload.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- C6: corpus statistics ---------------------------------------------------

_C6_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_chars
FROM documents
GROUP BY lang
"""


@register("text_stats", oracle=_C6_ORACLE)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: per-language token/char statistics with a length percentile.
    (DuckDB SUM(int) yields HUGEINT → both sides pin BIGINT.)"""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.9)), 6).alias(
            "p90_chars"
        ),
    )


# --- C7: text normalization --------------------------------------------------

# Dialect: DuckDB regexp_replace needs the 'g' flag to replace ALL
# matches; Spark replaces all by default.
_C7_ORACLE = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS norm_text
FROM documents
"""


@register("text_normalize", oracle=_C7_ORACLE)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: lowercase → strip non-alphanumerics → collapse whitespace."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        ).alias("norm_text"),
    )


# --- C8: heuristic quality filter --------------------------------------------

_C8_ORACLE = """
SELECT doc_id, lang, n_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
WHERE lang IN ('en', 'de', 'fr')
  AND n_chars BETWEEN 100 AND 500
  AND len(string_split(text, ' ')) >= 10
  AND n_chars <= 12 * len(string_split(text, ' '))
"""


@register("quality_filter", oracle=_C8_ORACLE)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: LLM-corpus quality heuristics — lang allowlist, length band,
    minimum token count, chars-per-token ceiling. All pushdown-friendly
    except the token count (computed, but still codegen)."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return d.filter(
        F.col("lang").isin("en", "de", "fr")
        & F.col("n_chars").between(100, 500)
        & (n_tokens >= 10)
        & (F.col("n_chars") <= 12 * n_tokens)
    ).select("doc_id", "lang", "n_chars", n_tokens.alias("n_tokens"))


# --- deterministic stratified downsampling -----------------------------------

# Corpus mix weighting: keep ~30% of every source stratum, membership a
# pure function of the row key (md5 prefix < '4d' keeps 77/256 ≈ 30.1%).
# Unlike sample()/sampleBy(), the kept set is independent of partition
# layout and executor count — re-runs, backfills, and engine swaps keep
# the identical subset, which is what makes a training-mix reproducible.
_SAMPLE_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE substr(md5(concat(source, ':',
           CAST(doc_id AS VARCHAR))), 1, 2) < '4d') AS n_kept,
       CAST(SUM(n_chars) FILTER (WHERE substr(md5(concat(source, ':',
           CAST(doc_id AS VARCHAR))), 1, 2) < '4d') AS BIGINT) AS chars_kept
FROM documents
GROUP BY source
"""


@register("sample_hash_stratified", oracle=_SAMPLE_ORACLE)
def q_sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic ~30% downsample with the audit counts a
    data-mix pipeline reports (docs kept and chars kept per stratum).

    Scale: membership is a stateless hash projection — no sampling job,
    no per-stratum pass; the audit is one partial+final hash agg on a
    20-value key. Tuning the mix = editing the per-source threshold
    table and re-running the same single scan.
    """
    d = load_table(spark, sf_dir, "documents")
    kept = (
        F.substring(
            F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
            1,
            2,
        )
        < "4d"
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars"))).alias("chars_kept"),
    )
