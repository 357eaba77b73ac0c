"""Adversarial-fixture oracle parity (r8).

The shipped fixture can hide boundary divergences — every recent ADVICE
find was of this class (Kaplan-Meier terminal day, non-ASCII
char-vs-byte indexing, Jaccard-threshold rounding). This module re-runs
the text/dedup operator family against its own oracles on SYNTHETIC
corpora built to hit the edges the generator never produces: periodic
texts (the winnow blind spot's neighborhood), byte-identical exact
duplicates, sub-window documents, whitespace runs, and single-family
shared prefixes. Deterministic corpora (no random generation) so a
divergence is a reproducible failure, not a flake.

Each corpus is written as a real parquet `documents` table and graded
through the SAME canonicalization path the driver uses
(conftest.assert_parity).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import assert_parity

# Heaviest suite tier: deselect with -m "not battery" for a fast dev
# loop; CI and round-close always run the full suite (pytest.ini).
pytestmark = pytest.mark.battery

engine.load_all()

_ROOT = "/tmp/rf_engine_fuzz_corpora"

# name -> list of texts; doc_id = index, lang/source cycle, n_chars = len
_CORPORA = {
    # verbatim-repeating content: every window repeats, the winnow
    # selection collapses to few distinct minima — both engines must
    # collapse IDENTICALLY
    "periodic": [
        "ab" * 40,
        "ab" * 40 + "tail one",
        "a" * 60,
        "abcabcabc" * 9,
        "the quick brown fox jumps over the lazy dog again and again",
    ],
    # byte-identical copies (absent from the shipped sf0.01 fixture —
    # pipe_dedup_stage_funnel pins that) plus one near-copy
    "exact_dups": [
        "identical content block for exact duplication testing purposes",
        "identical content block for exact duplication testing purposes",
        "identical content block for exact duplication testing purposes",
        "identical content block for exact duplication testing xpurposes",
        "entirely unrelated filler document with its own words here",
    ],
    # documents shorter than the 20-char substring window / 10-word
    # chunk — every greatest(...,1) guard fires
    "tiny_docs": [
        "x",
        "hello world",
        "three token doc",
        "exactly twenty chars",
        "a slightly longer document that clears the window size",
    ],
    # whitespace runs → empty tokens in split(' '); both engines must
    # tokenize identically
    "whitespace": [
        "a  b   c    d",
        "lead and trail ",
        " doubled  spaces  everywhere  in  this  document  body  here",
        "normal single spaced words in this one document",
        "normal single spaced words in this one document too",
    ],
    # non-ASCII text: umlauts, ligatures, CJK, emoji, Turkish dotted
    # capital I — the multilingual reality of a 100 TB corpus. Char
    # semantics (length/substring/split) agree cross-engine; the risky
    # surfaces are lower() locale rules and regex classes
    "non_ascii": [
        "Straße größer über schön müde käse für die wörter hier",
        "İstanbul LIKES DOTTED CAPITALS AND ligatures ﬁne ﬂow",
        "日本語のテキストと English mixed content document here",
        "emoji laden doc 🎉🚀 with ascii words between 🌍 symbols",
        "café naïve résumé coöperate soufflé crème brûlée déjà vu",
    ],
    # the empty partition — a corpus slice with zero documents must
    # report zeros/empties, never NULL aggregates or crashes
    "empty": [],
    # NULL text rows — production corpora have them; the engine policy
    # is "no content, no content-derived row", enforced identically on
    # both engines (Spark and DuckDB disagree on greatest(NULL, 1) and
    # on rendering NULL sketches, so an unguarded op diverges)
    "null_text": [
        None,
        "a normal document with several words inside it",
        "another ordinary document body for company here",
        None,
        "third real document text that is long enough to window",
    ],
    # NULL metadata (r9): real text but NULL lang / NULL source — the
    # metadata sibling of null_text. Production corpora carry them, and
    # the engines diverge on NULL-keyed string builds (concat_ws skips
    # vs concat renders empty — the fn_cast_hash class) while agreeing
    # on NULL group keys; rows are full 5-tuples, see _corpus_dir.
    "null_meta": [
        (0, "a perfectly ordinary document body with enough words here",
         None, "src1", 56),
        (1, "another regular document with its own distinct content",
         "en", None, 54),
        (2, "third document body with both metadata fields present ok",
         "de", "src2", 56),
        (3, None, None, None, 0),
        (4, "fifth document with null language but a real source tag",
         None, "src1", 55),
    ],
    # one shared-prefix family + distinct tails (the planted-fixture
    # shape, smaller and sharper)
    "prefix_family": [
        "shared leading boilerplate sentence that runs long enough to "
        "cover many windows alpha tail",
        "shared leading boilerplate sentence that runs long enough to "
        "cover many windows beta tail words",
        "shared leading boilerplate sentence that runs long enough to "
        "cover many windows gamma",
        "completely different document body with no overlap at all one",
        "completely different document body with no overlap at all two",
    ],
}

# SQL-graded keys whose oracles read ONLY the documents table and whose
# semantics exercise windows/chunks/shingles/hashes
_KEYS = [
    "dedup_exact",
    "dedup_substring",
    "dedup_substring_winnow",
    "dedup_chunk_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_fingerprint",
    "text_stats",
    "text_normalize",
    "quality_filter",
    "text_langid",
    "text_token_count",
    "text_vocab_topk",
    "text_char_entropy",
    "pipe_length_histogram",
    "pipe_repetition_score",
    "text_tokens_tfidf",
    "text_zipf_slope",
    "text_ttr",
    "text_readability",
    "text_bigram_lm",
    "pipe_doc_chunk",
    "pipe_token_rarity",
    "pipe_quality_composite",
    "pipe_secrets_scan",
    "pipe_blocklist_filter",
    "dedup_rate_by_source",
    "pipe_dedup_manifest",
    "text_keyword_tfidf_topk",
    "pipe_bpe_pair_stats",
    "pipe_span_corruption",
    "text_pmi_collocations",
    "pipe_ngram_novelty",
    "text_langid_confusion",
    # component resolution / production dedup pipeline — the exact_dups
    # corpus gives them byte-identical J=1.0 components, null_text a
    # contentless doc, periodic a degenerate shingle space
    "dedup_connected_components",
    "dedup_canonical_keep",
    "dedup_threshold_sweep",
    "pipe_dedup_stage_funnel",
    "dedup_incremental",
    # r9: documents-only scalar key moved here from the relational
    # battery so the null_meta corpus exercises its NULL-lang hash path
    "fn_cast_hash",
]


def _corpus_dir(spark, name: str) -> str:
    import hashlib

    path = os.path.join(_ROOT, name)
    # marker keyed on the corpus DEFINITION: editing _CORPORA must
    # rebuild, or the battery silently grades stale parquet
    fp = hashlib.md5(repr(_CORPORA[name]).encode()).hexdigest()[:10]
    marker = os.path.join(path, f"_built_{fp}")
    if not os.path.exists(marker):
        texts = _CORPORA[name]
        if texts and isinstance(texts[0], tuple):
            rows = list(texts)  # full (doc_id, text, lang, source, n_chars)
        else:
            rows = [
                # sources span the dedup_incremental split (src0-9 index,
                # src10+ incoming) so the asymmetric pass is non-vacuous
                (i, t, ["en", "de"][i % 2], f"src{(i * 7) % 20}",
                 len(t) if t is not None else 0)
                for i, t in enumerate(texts)
            ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "documents.parquet")
        )
        open(marker, "w").close()
    return path


@pytest.mark.parametrize("corpus", sorted(_CORPORA))
@pytest.mark.parametrize("key", _KEYS)
def test_adversarial_corpus_parity(spark, corpus, key):
    sf_dir = _corpus_dir(spark, corpus)
    con = duckdb.connect()
    try:
        # Spark writes documents.parquet as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet/*.parquet'"
        )
        df = engine.REGISTRY[key].fn(spark, sf_dir)
        assert_parity(df, engine.REGISTRY[key].oracle, con)
    finally:
        con.close()
