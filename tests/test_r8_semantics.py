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
        _winnow_hs_expr,
        _winnow_sel_expr,
    )
    from random_forest_using_hadoop_spark.sources import load_table

    d = load_table(spark, SF_DIR, "documents")
    hs = F.expr(_winnow_hs_expr())  # the operator's own expressions —
    sel = F.expr(_winnow_sel_expr())  # a regression there fails HERE too
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


def test_canonical_keep_one_survivor_per_component(spark):
    rows = engine.REGISTRY["dedup_canonical_keep"].fn(spark, SF_DIR).collect()
    assert rows
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    multi = 0
    for comp, members in by_comp.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1, f"component {comp}: {len(keeps)} survivors"
        assert keeps[0]["doc_id"] == keeps[0]["canonical_id"]
        # every member points at the same canonical
        assert len({r["canonical_id"] for r in members}) == 1
        if len(members) > 1:
            multi += 1
    assert multi > 0, "planted near-dup components exist [FIXTURES]"


def test_threshold_sweep_is_monotone(spark):
    rows = sorted(
        engine.REGISTRY["dedup_threshold_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["threshold"],
    )
    assert rows and rows[0]["threshold"] == 0.6
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_affected"] for r in rows]
    # raising the cutoff can only shrink the pair set and its doc cover
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    for r in rows:
        assert r["n_docs_affected"] <= 2 * r["n_pairs"]


def test_chunk_dedup_fractions_and_planted_families(spark):
    rows = engine.REGISTRY["dedup_chunk_exact"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500  # one row per document
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_chunk_fraction"] <= 1.0
    # planted shared-prefix families must surface as duplicated chunks
    assert any(r["n_dup_chunks"] > 0 for r in rows)
    # and most of the corpus is NOT chunk-duplicated
    clean = sum(1 for r in rows if r["n_dup_chunks"] == 0)
    assert clean > len(rows) // 2


def test_expectation_suite_all_green_on_fixture(spark):
    rows = engine.REGISTRY["pipe_expectation_suite"].fn(spark, SF_DIR).collect()
    assert len(rows) == 7
    failed = [r["constraint_name"] for r in rows if not r["passed"]]
    assert not failed, f"fixture violates constraints: {failed}"
    assert all(r["n_violations"] == 0 for r in rows)


def test_mv_delta_merge_equals_recompute(spark):
    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.helpers import dsum
    from random_forest_using_hadoop_spark.sources import load_table

    merged = {
        r["custkey"]: (r["order_count"], r["total_spend"])
        for r in engine.REGISTRY["sink_mv_delta_maintenance"]
        .fn(spark, SF_DIR)
        .collect()
    }
    direct = {
        r["custkey"]: (r["order_count"], r["total_spend"])
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("order_count"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .collect()
    }
    assert merged == direct  # increment ≡ recompute, bit-exact


def test_table_checksum_is_order_independent(spark):
    from pyspark.sql import functions as F

    base = {
        r["table_name"]: (r["n_rows"], r["checksum_xor"], r["checksum_summod"])
        for r in engine.REGISTRY["agg_table_checksum"].fn(spark, SF_DIR).collect()
    }
    assert set(base) == {"lineitem", "orders"}
    # recompute the lineitem checksum from a deliberately re-shuffled,
    # reverse-sorted copy — all three numbers must be identical
    from random_forest_using_hadoop_spark.sources import load_table

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .orderBy(F.col("l_orderkey").desc(), F.col("l_linenumber").desc())
        .repartition(7)
    )
    h = F.expr(
        "cast(conv(substring(md5(concat_ws('|', l_orderkey, l_linenumber,"
        " l_partkey, l_suppkey, cast(l_quantity as bigint), l_returnflag,"
        " l_linestatus)), 1, 15), 16, 10) as bigint)"
    )
    r = (
        li.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("bit_xor(h)").cast("bigint").alias("x"),
            F.sum(F.col("h") % 1000003).cast("bigint").alias("s"),
        )
        .collect()[0]
    )
    assert (r["n"], r["x"], r["s"]) == base["lineitem"]


def test_skew_diagnostics_internal_consistency(spark):
    rows = {
        r["join_key"]: r
        for r in engine.REGISTRY["agg_join_skew_diagnostics"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == {"lineitem.l_orderkey", "orders.o_custkey"}
    for r in rows.values():
        assert 1 <= r["p99_rows"] <= r["max_rows"]
        assert r["mean_rows"] <= r["max_rows"]
        assert r["skew_ratio"] >= 1.0
        # integer-exact verdict agrees with the float ratio's meaning
        assert r["salting_recommended"] == (
            r["max_rows"] * r["n_keys"] > 10 * r["n_rows"]
        )
        assert abs(r["mean_rows"] * r["n_keys"] - r["n_rows"]) < 1e-3


def test_dedup_funnel_stages_compose(spark):
    rows = {
        r["stage"]: r
        for r in engine.REGISTRY["pipe_dedup_stage_funnel"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == {"exact", "near_dup"}
    ex, nd = rows["exact"], rows["near_dup"]
    assert ex["docs_in"] == 500
    assert ex["docs_kept"] + ex["docs_dropped"] == ex["docs_in"]
    # near-dup stage consumes exactly the exact stage's survivors
    assert nd["docs_in"] == ex["docs_kept"]
    assert nd["docs_kept"] + nd["docs_dropped"] == nd["docs_in"]
    # the near-dup stage removes the planted families; the exact stage
    # drops 0 at sf0.01 (measured — the generator plants NEAR dups, not
    # byte-identical copies), which is itself worth pinning: a nonzero
    # count here would mean the fixture changed under the oracles
    assert ex["docs_dropped"] == 0 and ex["chars_dropped"] == 0
    assert nd["docs_dropped"] > 0 and nd["chars_dropped"] > 0


def test_freshness_report_covers_all_streams(spark):
    rows = engine.REGISTRY["agg_data_freshness_sla"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per event type
    assert any(r["lag_days"] == 0 for r in rows)  # freshest stream
    for r in rows:
        assert r["lag_days"] >= 0
        assert r["fresh"] == (r["lag_days"] <= 1)
