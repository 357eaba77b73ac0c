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
