"""Round-8 semantics beyond generic oracle parity: invariants that a
hash-match alone wouldn't explain to a reader, pinned as executable
documentation (sibling of test_r5_semantics.py / test_r7_semantics.py)."""

from __future__ import annotations

import duckdb

import random_forest_using_hadoop_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def test_documents_text_ascii_invariant():
    """The multimodal oracles (multimodal_decode / multimodal_resize)
    index document text by CHARACTER on the DuckDB side while the Spark
    encoders tile utf-8 BYTES — identical only while every document is
    pure ASCII. Pin that corpus invariant (octet_length == length) at
    both graded scale factors so a fixture change surfaces here, not as
    an opaque pixel-hash mismatch."""
    for sf in ("sf0.001", "sf0.01"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet')"
            f" WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} non-ASCII documents break the oracles"


def test_substring_winnow_recall_vs_exact_truth_set(spark):
    """The winnowed+capped production form must find every pair the
    exact all-windows baseline qualifies (measured: the 26 sf0.01 truth
    pairs share >= 3 selected hashes vs the threshold of 2; the df cap
    drops zero rows at this SF since max window df is 6)."""
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in engine.REGISTRY["dedup_substring"].fn(spark, SF_DIR).collect()
    }
    winnow = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in engine.REGISTRY["dedup_substring_winnow"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert exact, "truth set non-empty [FIXTURES]"
    missed = exact - winnow
    assert not missed, f"winnowing lost {len(missed)} truth pairs: {missed}"


def test_substring_winnow_shrinks_join_input(spark):
    """Winnowing density 2/(g+1) with g=8 predicts ~0.22; gate the
    realized shrink at < 0.35 so a selection regression (e.g. the
    slice window silently becoming 1) cannot pass as a no-op."""
    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.operators.dedup_lsh import (
        _SUBSTR_WIN,
        _WINNOW_G,
    )
    from random_forest_using_hadoop_spark.sources import load_table

    d = load_table(spark, SF_DIR, "documents")
    hs = F.expr(
        f"transform(sequence(1, greatest(length(text) - {_SUBSTR_WIN - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring(text, i, {_SUBSTR_WIN})), 1, 15),"
        f" 16, 10) as bigint))"
    )
    sel = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {_WINNOW_G - 1}, 1)),"
        f" j -> array_min(slice(hs, j, {_WINNOW_G}))))"
    )
    counts = (
        d.select(F.col("doc_id"), hs.alias("hs"))
        .select(
            F.size("hs").alias("n_all"),
            F.size(sel).alias("n_sel"),
        )
        .agg(F.sum("n_all").alias("a"), F.sum("n_sel").alias("s"))
        .collect()[0]
    )
    assert counts["s"] / counts["a"] < 0.35
