"""Tier C semantics beyond generic oracle parity: the near-dup passes
must actually *recover the planted duplicates* (FIXTURES: shared-40-char
prefix groups), and the ANN paths must return sane, deterministic
neighbor sets."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.sources import load_table
from tests.conftest import SF_DIR

engine.load_all()


def _planted_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    groups = (
        docs.groupBy(F.substring("text", 1, 40).alias("p"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    return {
        tuple(sorted(pair))
        for r in groups
        for pair in itertools.combinations(r["ids"], 2)
    }


def test_minhash_recovers_planted_groups(spark):
    planted = _planted_pairs(spark)
    assert planted
    found = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in engine.REGISTRY["dedup_minhash"].fn(spark, SF_DIR).collect()
    }
    assert planted <= found


def test_simhash_recovers_planted_groups(spark):
    planted = _planted_pairs(spark)
    found = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in engine.REGISTRY["dedup_simhash"].fn(spark, SF_DIR).collect()
    }
    assert planted <= found


def test_ngram_jaccard_recovers_planted_groups(spark):
    planted = _planted_pairs(spark)
    found = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in engine.REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    assert planted <= found


def test_ann_lsh_recall_audit(spark):
    """sim_ann_lsh returns its recall audit: deterministic across runs,
    and the 0.6 recall floor holds (0.98 measured at sf0.01)."""
    run = lambda: sorted(
        map(tuple, engine.REGISTRY["sim_ann_lsh"].fn(spark, SF_DIR).collect())
    )
    a = run()
    assert a == run()
    ((n_queries, k, recall_ok),) = a
    assert n_queries == 5 and k == 10 and recall_ok


def test_ann_ivf_recall_audit(spark):
    """sim_ann_ivf (nprobe=4 of 8 cells) must clear the same recall
    floor (0.78 measured at sf0.01)."""
    ((n_queries, k, recall_ok),) = engine.REGISTRY["sim_ann_ivf"].fn(
        spark, SF_DIR
    ).collect()
    assert n_queries == 5 and k == 10 and recall_ok


def test_decode_stub_bounds(spark):
    rows = engine.REGISTRY["multimodal_decode"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["width"] < 1024 and 0 <= r["height"] < 1024
        assert r["decoder"] == "stub" and r["n_bytes"] > 0


def test_framesample_stride(spark):
    rows = engine.REGISTRY["multimodal_framesample"].fn(spark, SF_DIR).collect()
    for r in rows:
        expect = (r["n_frames"] + 3) // 4
        assert len(r["sampled_hashes"].split(",")) == expect


def test_query_topk_equals_bruteforce(spark):
    """sim_query_topk (batch-prune + exact re-rank) must reproduce the
    brute-force sim_cosine_topk result bit-for-bit — the prune is only
    legitimate if it is lossless."""
    fast = sorted(
        map(tuple, engine.REGISTRY["sim_query_topk"].fn(spark, SF_DIR).collect())
    )
    brute = sorted(
        map(tuple, engine.REGISTRY["sim_cosine_topk"].fn(spark, SF_DIR).collect())
    )
    assert fast == brute
