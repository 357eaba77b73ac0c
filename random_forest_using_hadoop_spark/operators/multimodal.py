"""Multimodal columns — SURVEY.md §2 C9 plus the task-spec decode /
frame-sample plumbing.

The container has no image/audio libraries and the testdata has no real
media, so media bytes are modeled as an opaque ``binary`` payload column
(utf-8 of the doc text) with typed metadata, exactly as a 100 TB media
lake stores them. The *decode* step is a clearly marked stub (gated on
the real library being importable, deterministic fake otherwise); the
Spark-side plumbing — binary column, metadata struct, Arrow-batched
``mapInPandas``, partition-preserving schema — is real and oracle-checked
because the fake is a pure function of the bytes that DuckDB can mirror.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- C9: multimodal row assembly ---------------------------------------------

_C9_ORACLE = """
WITH m AS (
  SELECT struct_pack(
           doc_id := d.doc_id,
           text := d.text,
           lang := d.lang,
           embedding := e.embedding,
           label := e.label
         ) AS mm
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT mm.doc_id AS doc_id,
       mm.lang AS lang,
       length(mm.text) AS n_chars,
       len(mm.embedding) AS emb_dim,
       round(CAST(mm.embedding[1] AS DOUBLE), 6) AS emb_d1,
       mm.label AS label
FROM m
"""


@register("multimodal_struct", oracle=_C9_ORACLE)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: one row = struct{text fields, embedding, label} joined from
    documents ⋈ embeddings, then scalar projections back out of the
    struct (the SQL-checkable slice of the multimodal row; the struct
    itself is the engine's multimodal record format).

    Scale: an equi-join on the id — broadcast if one side is a small
    curated set, shuffle otherwise; struct packing is free (columnar)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    mm = d.join(e, d.doc_id == e.vec_id).select(
        F.struct("doc_id", "text", "lang", "embedding", "label").alias("mm")
    )
    return mm.select(
        F.col("mm.doc_id").alias("doc_id"),
        F.col("mm.lang").alias("lang"),
        F.length("mm.text").alias("n_chars"),
        F.size("mm.embedding").alias("emb_dim"),
        F.round(F.element_at("mm.embedding", 1).cast("double"), 6).alias(
            "emb_d1"
        ),
        F.col("mm.label").alias("label"),
    )


# --- decode stub over mapInPandas --------------------------------------------

_DECODE_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ('0x' || substr(md5(text), 1, 4))::INTEGER % 1024 AS width,
       ('0x' || substr(md5(text), 5, 4))::INTEGER % 1024 AS height,
       'stub' AS decoder
FROM documents
"""


def _decode_image(payload: bytes) -> tuple[int, int, str]:
    """Decode an image payload → (width, height, decoder).

    STUB: real decoding needs an image library that is not in this
    container. When PIL is importable this raises NotImplementedError at
    the integration point rather than guessing; otherwise it returns a
    deterministic fake derived from the payload's md5 so the pipeline
    stays testable end-to-end.
    """
    try:
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode path not wired: container lacks test media"
        )
    except ImportError:
        import hashlib

        h = hashlib.md5(payload).hexdigest()
        return int(h[0:4], 16) % 1024, int(h[4:8], 16) % 1024, "stub"


@register("multimodal_decode", oracle=_DECODE_ORACLE)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract metadata from a binary media column via
    Arrow-batched ``mapInPandas`` — the real 100 TB shape: one Python
    worker per partition, whole Arrow record batches in/out, schema
    declared up front, no per-row py4j traffic. The stubbed decode is a
    pure function of the bytes, so DuckDB mirrors it for the hash check.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "decoder": [m[2] for m in meta],
                }
            )

    return d.mapInPandas(
        decode_batch,
        schema="doc_id long, n_bytes long, width int, height int, decoder string",
    )


# --- frame sampling over mapInPandas -----------------------------------------

_FRAME_CHARS = 100  # one "frame" per 100-char chunk of the payload text
_FRAME_STRIDE = 4  # keep every 4th frame

_FRAMES_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT) AS n_frames,
         list_transform(
           range(1, CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT) + 1),
           i -> md5(text[(i - 1) * {_FRAME_CHARS} + 1 : i * {_FRAME_CHARS}])
         ) AS frames
  FROM documents
)
SELECT doc_id, n_frames,
       array_to_string(list_filter(list_transform(frames, (x, i) -> CASE
           WHEN (i - 1) % {_FRAME_STRIDE} = 0 THEN x END),
         x -> x IS NOT NULL), ',') AS sampled_hashes
FROM f
"""


@register("multimodal_framesample", oracle=_FRAMES_ORACLE)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for a video-like payload: chunk the payload into
    fixed-size frames, keep every 4th frame's content hash. Runs in
    ``mapInPandas`` (the shape a real ffmpeg-backed sampler needs — the
    hash stands in for the decoded keyframe), deterministic from bytes
    so DuckDB mirrors it.

    Scale: frame extraction is embarrassingly parallel per row; output
    arrays stay bounded by stride, and nothing shuffles.
    """
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, sampled = [], []
            for t in pdf["text"]:
                chunks = [
                    t[i : i + _FRAME_CHARS]
                    for i in range(0, len(t), _FRAME_CHARS)
                ]
                n_frames.append(len(chunks))
                # Comma-joined, not a list: array cells crash the
                # driver's pandas canonicalizer (r1 lesson).
                sampled.append(
                    ",".join(
                        hashlib.md5(c.encode("utf-8")).hexdigest()
                        for c in chunks[::_FRAME_STRIDE]
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "sampled_hashes": sampled,
                }
            )

    return d.mapInPandas(
        sample_batch,
        schema="doc_id long, n_frames long, sampled_hashes string",
    )
