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


def test_decode_roundtrips_real_png(spark):
    rows = engine.REGISTRY["multimodal_decode"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert 4 <= r["width"] < 65 and 3 <= r["height"] < 40
        assert r["codec"] == "png8-gray" and r["pixel_sum"] > 0


def test_png_decoder_reverses_all_five_filters():
    """The decoder must reconstruct pixels through every standard
    scanline filter (ISO/IEC 15948 §9), not just the filter-0 rows our
    encoder emits — craft one image whose five rows use filters 0-4."""
    import struct
    import zlib

    from random_forest_using_hadoop_spark.operators.multimodal import (
        _PNG_SIG,
        _png_decode,
    )

    width, height = 7, 5
    pixels = [[(13 * y + 31 * x) % 256 for x in range(width)] for y in range(height)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur, prev = pixels[y], pixels[y - 1] if y else [0] * width
        raw.append(f)
        for x in range(width):
            left = cur[x - 1] if x else 0
            up, ul = prev[x], (prev[x - 1] if x else 0)
            pred = [0, left, up, (left + up) // 2, paeth(left, up, ul)][f]
            raw.append((cur[x] - pred) & 0xFF)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, px = _png_decode(png)
    assert (w, h) == (width, height)
    assert list(px) == [p for row in pixels for p in row]


def test_png_decoder_rejects_corruption():
    import pytest

    from random_forest_using_hadoop_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
    )

    good = _png_encode(b"some payload bytes", 9, 4)
    assert _png_decode(good)[:2] == (9, 4)
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT body → CRC must catch it
    with pytest.raises(ValueError):
        _png_decode(bytes(flipped))
    with pytest.raises(ValueError):
        _png_decode(b"\x00" * 32)


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
