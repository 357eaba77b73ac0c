"""Multimodal columns — SURVEY.md §2 C9 plus the task-spec decode /
frame-sample plumbing.

The testdata has no real media files, so the pipeline SYNTHESIZES real
ones: each document's text is rendered into a genuine PNG (8-bit
grayscale, written to the public spec — ISO/IEC 15948 / RFC 2083 chunk
layout, zlib-deflated filtered scanlines, CRC-32 per chunk) carried as
an opaque ``binary`` column, exactly as a 100 TB media lake stores
payloads. The decode step is a REAL codec: it validates the signature
and chunk CRCs, parses IHDR, inflates IDAT, and reverses all five
standard scanline filters to recover the pixels (PIL cross-checks the
result when importable). The graded columns (dimensions + pixel sum)
are therefore round-tripped through actual image bytes, while DuckDB
recomputes the expected values independently from the source text.
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


# --- real PNG encode → decode over mapInPandas -------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# image dims are a pure function of the text length so the oracle can
# predict what the decoder must recover from the bytes
_W_MOD, _W_OFF = 61, 4
_H_MOD, _H_OFF = 37, 3

_DECODE_ORACLE = f"""
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_W_MOD} + {_W_OFF} AS w,
         length(text) % {_H_MOD} + {_H_OFF} AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(list_sum(list_transform(range(0, w * h),
            i -> ascii(text[(i % n) + 1 : (i % n) + 1]))) AS BIGINT)
         AS pixel_sum,
       'png8-gray' AS codec
FROM p
"""


def _png_encode(data: bytes, width: int, height: int) -> bytes:
    """Write an 8-bit grayscale PNG whose pixels tile ``data`` row-major
    (pixel i = data[i mod len]). Pure stdlib, to the public spec
    (ISO/IEC 15948): signed chunks IHDR/IDAT/IEND, filter byte 0 per
    scanline, one deflate stream."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    n = len(data)
    raw = b"".join(
        b"\x00"
        + bytes(data[(y * width + x) % n] for x in range(width))
        for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale non-interlaced PNG → (width, height,
    pixel bytes). A real, if narrow, decoder: validates the signature
    and every chunk's CRC-32, parses IHDR, concatenates and inflates the
    IDAT stream, and reverses all five standard scanline filters
    (None/Sub/Up/Average/Paeth — ISO/IEC 15948 §9), not just the one the
    encoder above happens to emit."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    width = height = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError("only 8-bit grayscale non-interlaced supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    pixels = bytearray()
    prev = bytearray(width)
    for y in range(height):
        f = raw[y * stride]
        row = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if f == 1:  # Sub (bpp = 1: left neighbor is the reconstructed byte)
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif f == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(width):
                a = row[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown scanline filter {f}")
        pixels += row
        prev = row
    return width, height, bytes(pixels)


def _decode_image(payload: bytes) -> tuple[int, int, int, str]:
    """Decode an image payload → (width, height, pixel_sum, codec),
    through the real PNG parser above. When PIL is importable its
    decode cross-checks ours — any disagreement raises rather than
    letting a codec bug grade silently."""
    w, h, px = _png_decode(payload)
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        if img.size != (w, h) or bytes(img.convert("L").tobytes()) != px:
            raise ValueError("pure-python PNG decode disagrees with PIL")
    except ImportError:
        pass
    return w, h, sum(px), "png8-gray"


@register("multimodal_decode", oracle=_DECODE_ORACLE)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode over a binary column via Arrow-batched
    ``mapInPandas`` — the 100 TB shape: one Python worker per partition,
    whole Arrow record batches in/out, schema declared up front, no
    per-row py4j traffic.

    Two mapInPandas stages through a real ``binary`` column: stage 1
    renders each doc's text into an actual PNG payload (dims are a pure
    function of text length); stage 2 decodes those bytes with the real
    parser — signature, CRCs, inflate, defilter — and reports the
    recovered dimensions and pixel sum. The oracle recomputes all three
    from the source text without touching PNG at all, so a hash match
    proves the encode→decode round trip reproduced every pixel.
    """
    import pandas as pd

    # The batch closures call the module-level codec (_png_encode /
    # _decode_image). Cloudpickle serializes module-level functions by
    # REFERENCE (worker re-imports the module), which breaks when the
    # grading driver's Python workers don't have this repo on their
    # path — so ship this module's functions by VALUE instead. The
    # codec is pure stdlib, so the pickled closure is self-contained.
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                data = t.encode("utf-8")
                n = len(data)
                payloads.append(
                    _png_encode(data, n % _W_MOD + _W_OFF, n % _H_MOD + _H_OFF)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(encode_batch, schema="doc_id long, payload binary")

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "pixel_sum": [m[2] for m in meta],
                    "codec": [m[3] for m in meta],
                }
            )

    return media.mapInPandas(
        decode_batch,
        schema="doc_id long, width int, height int, pixel_sum long, codec string",
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


# --- WAV/RIFF audio codec over mapInPandas -----------------------------------

_WAV_RATE = 16000  # Hz, 16-bit mono PCM
_WAV_A = 2654435761  # Knuth multiplicative constant — sample formula seed
_WAV_B = 40503


def _wav_encode(samples) -> bytes:
    """Minimal but spec-conformant RIFF/WAVE writer: 16-bit little-endian
    mono PCM, correct chunk sizes. ``samples`` is an int16 numpy array."""
    import struct

    data = samples.astype("<i2").tobytes()
    byte_rate = _WAV_RATE * 2
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF",
            36 + len(data),
            b"WAVE",
            b"fmt ",
            16,
            1,  # PCM
            1,  # mono
            _WAV_RATE,
            byte_rate,
            2,  # block align
            16,  # bits/sample
            b"data",
            len(data),
        )
        + data
    )


def _wav_decode(payload: bytes):
    """Real RIFF chunk-walking decoder: validates the RIFF/WAVE
    signature, parses fmt (must be 16-bit mono PCM at the expected
    rate), locates the data chunk, and returns the int16 samples.
    When possible the stdlib ``wave`` module cross-checks our parse —
    any disagreement raises rather than letting a codec bug grade
    silently (same doctrine as the PNG/PIL cross-check)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            codec, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if (codec, ch, rate, bits) != (1, 1, _WAV_RATE, 16):
                raise ValueError("only 16-bit mono PCM supported")
            fmt_ok = True
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    try:
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            if (
                w.getnchannels() != 1
                or w.getsampwidth() != 2
                or w.getframerate() != _WAV_RATE
                or w.readframes(w.getnframes()) != data
            ):
                raise ValueError("RIFF parse disagrees with stdlib wave")
    except ImportError:
        pass
    return samples


_AUDIO_ORACLE = f"""
WITH p AS (
  SELECT doc_id, 2000 + (doc_id % 5) * 500 AS n FROM documents
),
s AS (
  SELECT doc_id, n, unnest(range(0, n)) AS i FROM p
),
u AS (
  SELECT doc_id, n, i,
         (doc_id * {_WAV_A} + i * {_WAV_B}) % 65536 AS uv
  FROM s
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(SUM(uv * (i + 1)) AS BIGINT) AS sample_checksum,
       CAST(SUM((uv - 32768) * (uv - 32768)) AS BIGINT) AS energy_sq,
       round(sqrt(SUM((uv - 32768) * (uv - 32768)) * 1.0 / n), 6) AS rms,
       round(n * 1000.0 / {_WAV_RATE}, 6) AS duration_ms
FROM u GROUP BY doc_id, n
"""


@register("multimodal_audio_codec", oracle=_AUDIO_ORACLE)
def q_multimodal_audio_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio round trip through a real RIFF/WAV codec over Arrow-batched
    ``mapInPandas`` — the audio sibling of multimodal_decode's PNG path.
    Stage 1 synthesizes each doc's deterministic 16-bit mono PCM track
    (sample_k = (doc_id·{a} + k·{b}) mod 65536 − 32768 — pure integer
    arithmetic, so the oracle reproduces every sample without touching
    WAV) and encodes real RIFF bytes (fmt + data chunks, correct sizes);
    stage 2 walks the chunks back (signature, fmt validation, stdlib
    ``wave`` cross-check) and reports per-track sample counts, an
    order-pinning position checksum, integer-exact energy, RMS, and
    duration. A hash match proves the encode→decode byte round trip
    recovered every sample in order.

    Scale: identical shape to the PNG path — binary column, one Python
    worker per partition, whole Arrow batches, schema declared up
    front; a real ffmpeg/soundfile decoder drops into ``decode_batch``
    unchanged. Sample synthesis is the portability device standing in
    for real recordings, exactly as the text-rendered PNGs do.
    """.format(a=_WAV_A, b=_WAV_B)
    import sys

    import pandas as pd

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 2000 + (int(doc_id) % 5) * 500
                k = np.arange(n, dtype=np.int64)
                u = (int(doc_id) * _WAV_A + k * _WAV_B) % 65536
                payloads.append(_wav_encode((u - 32768).astype("<i2")))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(encode_batch, schema="doc_id long, payload binary")

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            rows = {
                "doc_id": [],
                "n_samples": [],
                "sample_checksum": [],
                "energy_sq": [],
                "rms": [],
                "duration_ms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _wav_decode(bytes(payload)).astype(np.int64)
                n = len(s)
                u = s + 32768
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(n)
                rows["sample_checksum"].append(
                    int(np.sum(u * (np.arange(n, dtype=np.int64) + 1)))
                )
                energy = int(np.sum(s * s))
                rows["energy_sq"].append(energy)
                rows["rms"].append(round(math.sqrt(energy * 1.0 / n), 6))
                rows["duration_ms"].append(round(n * 1000.0 / _WAV_RATE, 6))
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        decode_batch,
        schema=(
            "doc_id long, n_samples long, sample_checksum long,"
            " energy_sq long, rms double, duration_ms double"
        ),
    )


# --- nearest-neighbor resize through the real codec --------------------------

# Downsampled grid keeps pixels at even (x, y); the oracle recomputes
# each kept pixel straight from the text tiling pixel(i) = data[i mod n]
# used by the encoder, so a hash match proves decode → resize →
# re-encode → re-decode reproduced every kept pixel byte-for-byte.
# Cross-engine length contract (shared with multimodal_decode): the
# oracle's length(text)/ascii() are CHARACTER-based while the Spark
# encoder tiles utf-8 BYTES — identical only while document text is
# pure ASCII, an invariant of the generated corpus PINNED by
# tests/test_r8_semantics.py::test_documents_text_ascii_invariant
# (octet_length == length for every doc). Non-ASCII corpora would
# need byte-indexed oracles (encode()/blob slicing) on the DuckDB side.
_RESIZE_ORACLE = f"""
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_W_MOD} + {_W_OFF} AS w,
         length(text) % {_H_MOD} + {_H_OFF} AS h
  FROM documents
),
r AS (
  SELECT doc_id, text, n, w,
         CAST((w + 1) // 2 AS INTEGER) AS rw,
         CAST((h + 1) // 2 AS INTEGER) AS rh
  FROM p
)
SELECT doc_id,
       rw AS width,
       rh AS height,
       CAST(list_sum(list_transform(
           list_transform(range(0, rw * rh),
                          j -> ((2 * (j // rw)) * w + 2 * (j % rw)) % n),
           i -> ascii(text[i + 1 : i + 1]))) AS BIGINT) AS pixel_sum,
       TRUE AS roundtrip_ok
FROM r
"""


@register("multimodal_resize", oracle=_RESIZE_ORACLE)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize as a distributed media transform: decode each
    synthesized PNG with the real parser, nearest-neighbor downsample
    2× (keep even-coordinate pixels), re-encode the SMALLER image
    through the same spec-conformant writer, decode it again, and grade
    the resized dimensions + pixel sum — with ``roundtrip_ok`` proving
    the second decode reproduced the resized pixels exactly. This is
    the missing third leg of the media pipeline next to
    [[multimodal_decode]] (codec) and [[multimodal_framesample]]
    (temporal sampling): a per-item geometric transform.

    Scale: one Arrow-batched ``mapInPandas`` stage per hop, schema
    declared up front, no per-row py4j traffic; resize is pure
    per-payload CPU, embarrassingly parallel. A real lake swaps the
    stdlib codec for libvips/PIL inside the same batch closure — the
    Spark plumbing (binary column in, typed struct out) is unchanged.
    """
    import sys

    import pandas as pd

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                data = t.encode("utf-8")
                n = len(data)
                payloads.append(
                    _png_encode(data, n % _W_MOD + _W_OFF, n % _H_MOD + _H_OFF)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(encode_batch, schema="doc_id long, payload binary")

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sums, oks = [], [], [], []
            for p in pdf["payload"]:
                w, h, px = _png_decode(bytes(p))
                rw, rh = (w + 1) // 2, (h + 1) // 2
                small = bytes(
                    px[y * w + x]
                    for y in range(0, h, 2)
                    for x in range(0, w, 2)
                )
                # re-encode the resized image (tiling degenerates to
                # identity: len(small) == rw*rh) and decode it back
                w2, h2, px2 = _png_decode(_png_encode(small, rw, rh))
                widths.append(w2)
                heights.append(h2)
                sums.append(sum(px2))
                oks.append(w2 == rw and h2 == rh and px2 == small)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "pixel_sum": sums,
                    "roundtrip_ok": oks,
                }
            )

    return media.mapInPandas(
        resize_batch,
        schema=(
            "doc_id long, width int, height int,"
            " pixel_sum long, roundtrip_ok boolean"
        ),
    )


# --- perceptual-hash image dedup ----------------------------------------------

# dHash geometry: 8 rows x 9 sample columns -> 64 horizontal-gradient
# bits, packed into two 32-bit words (the binary-Hamming convention
# sim_r15c uses). Samples are exact pixel picks at floor-divided grid
# coordinates, not block means, so the oracle can re-derive every bit
# from the source text with integer arithmetic alone.
_PHASH_ORACLE = f"""
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_W_MOD} + {_W_OFF} AS w,
         length(text) % {_H_MOD} + {_H_OFF} AS h
  FROM documents
),
hashes AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), b -> CASE WHEN
             ascii(text[((((b // 8) * h) // 8) * w
                         + (((b % 8) * w) // 9)) % n + 1 :
                        ((((b // 8) * h) // 8) * w
                         + (((b % 8) * w) // 9)) % n + 1])
             < ascii(text[((((b // 8) * h) // 8) * w
                           + ((((b % 8) + 1) * w) // 9)) % n + 1 :
                          ((((b // 8) * h) // 8) * w
                           + ((((b % 8) + 1) * w) // 9)) % n + 1])
             THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS h0,
         CAST(list_sum(list_transform(range(32, 64), b -> CASE WHEN
             ascii(text[((((b // 8) * h) // 8) * w
                         + (((b % 8) * w) // 9)) % n + 1 :
                        ((((b // 8) * h) // 8) * w
                         + (((b % 8) * w) // 9)) % n + 1])
             < ascii(text[((((b // 8) * h) // 8) * w
                           + ((((b % 8) + 1) * w) // 9)) % n + 1 :
                          ((((b // 8) * h) // 8) * w
                           + ((((b % 8) + 1) * w) // 9)) % n + 1])
             THEN (1::BIGINT << (b - 32)) ELSE 0 END)) AS BIGINT) AS h1
  FROM p
),
all_hashes AS (
  -- every doc's image, PLUS a brightness-shifted (+5 on every pixel)
  -- VARIANT for doc_id % 17 = 0: a monotone shift preserves every
  -- strict '<' gradient bit, so the variant's dHash EQUALS the
  -- original's even though the payload bytes differ
  SELECT h0, h1 FROM hashes
  UNION ALL
  SELECT h0, h1 FROM hashes WHERE doc_id % 17 = 0
),
groups AS (
  SELECT h0, h1, CAST(COUNT(*) AS BIGINT) AS g
  FROM all_hashes GROUP BY h0, h1
)
SELECT g AS group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(g * (g - 1) // 2) AS BIGINT) AS n_candidate_pairs
FROM groups GROUP BY g
"""


@register("multimodal_phash_dedup", oracle=_PHASH_ORACLE)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH IMAGE DEDUP: every document's PNG (the real
    codec round trip, as in [[multimodal_decode]]) is reduced to a
    64-bit dHASH — horizontal-gradient sign bits over an 8×9 grid of
    exact pixel samples — and images are grouped by hash. The planted
    duplicates are BRIGHTNESS-SHIFTED variants (+5 on every pixel for
    doc_id % 17 = 0): their PNG bytes differ, so exact/byte-level
    dedup can never pair them, but a monotone intensity shift
    preserves every strict '<' gradient comparison, so their dHash
    EQUALS the original's — precisely the invariance class perceptual
    hashing exists for. The graded output is the hash-group-size
    histogram with candidate-pair counts — the image-side analog of
    [[dedup_exact]], built on [[sim_hamming_binary]]'s packed-word
    convention so a Hamming-radius variant is one `bit_count(xor())`
    away.

    The hash is computed from PIXELS RECOVERED BY THE REAL PNG
    DECODER (signature, CRCs, inflate, defilter) while the oracle
    re-derives every sampled pixel from the source text via the
    tiling rule — so a hash match certifies the decode reproduced
    each sampled byte exactly, pixel-sum aggregates can't hide
    transposed coordinates, and the grid arithmetic (floor-divided
    sample coordinates) is bit-identical in both engines.

    Scale: encode/hash run as two Arrow-batched ``mapInPandas``
    stages (no per-row Python); the dedup itself is a groupBy on an
    8-byte key — at 100 TB of images the hash table is the only
    shuffled state, 64 bits per image, and near-dup search extends to
    banding the two words exactly like the MinHash-LSH tier.
    """
    import pandas as pd
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                data = t.encode("utf-8")
                n = len(data)
                w, h = n % _W_MOD + _W_OFF, n % _H_MOD + _H_OFF
                ids.append(int(i))
                payloads.append(_png_encode(data, w, h))
                if int(i) % 17 == 0:
                    # the perceptual payload: a brightness-shifted COPY
                    # (every pixel +5 — byte-different PNG, identical
                    # gradient signs) under a synthetic image id
                    ids.append(int(i) + 1_000_000_000)
                    payloads.append(
                        _png_encode(bytes(b + 5 for b in data), w, h)
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = d.mapInPandas(encode_batch, schema="doc_id long, payload binary")

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h0s, h1s = [], []
            for p in pdf["payload"]:
                w, h, px = _png_decode(bytes(p))
                h0 = h1 = 0
                for b in range(64):
                    r, c = b // 8, b % 8
                    y = (r * h) // 8
                    left = px[y * w + (c * w) // 9]
                    right = px[y * w + ((c + 1) * w) // 9]
                    if left < right:
                        if b < 32:
                            h0 |= 1 << b
                        else:
                            h1 |= 1 << (b - 32)
                h0s.append(h0)
                h1s.append(h1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "h0": h0s, "h1": h1s}
            )

    hashes = media.mapInPandas(
        hash_batch, schema="doc_id long, h0 long, h1 long"
    )
    groups = hashes.groupBy("h0", "h1").agg(
        F.count(F.lit(1)).cast("bigint").alias("g")
    )
    return groups.groupBy(F.col("g").alias("group_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.expr("g * (g - 1) div 2")).cast("bigint").alias(
            "n_candidate_pairs"
        ),
    )
