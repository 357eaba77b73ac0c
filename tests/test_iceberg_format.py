"""Unit tests for the from-scratch Avro OCF codec (iceberg_format.py):
schema-driven binary encode/decode self-consistency across every type
Iceberg metadata uses, OCF container framing, named-type references,
block-size-form arrays, and the deflate read path. No Spark session."""

from __future__ import annotations

import json
import zlib

import pytest

from random_forest_using_hadoop_spark.iceberg_format import (
    AVRO_MAGIC,
    _Decoder,
    _zz_encode,
    decode_value,
    encode_value,
    ocf_read,
    ocf_write,
)


def _roundtrip(schema, value):
    names: dict = {}
    out = bytearray()
    encode_value(schema, value, out, names)
    got = decode_value(schema, _Decoder(bytes(out)), dict(names))
    return got


def test_zigzag_longs():
    # spec examples: 0→0x00, -1→0x01, 1→0x02, plus multi-byte + 64-bit
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-64, b"\x7f")]:
        out = bytearray()
        _zz_encode(n, out)
        assert bytes(out) == want, n
    for n in [63, 64, -65, 1 << 40, -(1 << 40), (1 << 62), -(1 << 62)]:
        out = bytearray()
        _zz_encode(n, out)
        assert _Decoder(bytes(out)).read_long() == n


def test_primitive_roundtrips():
    cases = [
        ("null", None),
        ("boolean", True),
        ("boolean", False),
        ("int", -12345),
        ("long", 1_700_000_000_123),
        ("double", 3.140625),
        ("string", "käse/∆"),
        ("bytes", b"\x00\xff\x10"),
    ]
    for schema, v in cases:
        assert _roundtrip(schema, v) == v, schema
    # float roundtrips through 32-bit
    assert _roundtrip("float", 0.5) == 0.5


def test_record_union_array_map_roundtrip():
    schema = {
        "type": "record",
        "name": "r1",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "long"}},
            {"name": "e", "type": {"type": "fixed", "name": "f16", "size": 4}},
            {
                "name": "g",
                "type": {"type": "enum", "name": "st", "symbols": ["X", "Y"]},
            },
        ],
    }
    v = {
        "a": 7,
        "b": None,
        "c": [1, -2, 3],
        "d": {"k1": 10, "k2": -20},
        "e": b"abcd",
        "g": "Y",
    }
    assert _roundtrip(schema, v) == v
    v2 = dict(v, b="hello")
    assert _roundtrip(schema, v2) == v2


def test_named_type_reference_roundtrip():
    """A record type defined once and referenced by NAME later (how
    Iceberg manifests reference the r2 data_file struct)."""
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {
                "name": "first",
                "type": {
                    "type": "record",
                    "name": "pt",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
            {"name": "second", "type": ["null", "pt"]},
        ],
    }
    v = {"first": {"x": 1}, "second": {"x": 2}}
    assert _roundtrip(schema, v) == v


def test_array_block_size_form_read():
    """Foreign writers may emit the negative-count block form (count<0
    → abs count, then a block byte size). The reader must honor it."""
    names: dict = {}
    body = bytearray()
    _zz_encode(-2, body)  # two items, size-prefixed block
    inner = bytearray()
    _zz_encode(5, inner)
    _zz_encode(6, inner)
    _zz_encode(len(inner), body)
    body += inner
    _zz_encode(0, body)
    got = decode_value(
        {"type": "array", "items": "long"}, _Decoder(bytes(body)), names
    )
    assert got == [5, 6]


def test_ocf_write_read_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "added_snapshot_id", "type": ["null", "long"]},
        ],
    }
    recs = [
        {"manifest_path": "m1.avro", "added_snapshot_id": 123},
        {"manifest_path": "m2.avro", "added_snapshot_id": None},
    ]
    p = str(tmp_path / "list.avro")
    ocf_write(p, schema, recs, metadata={"format-version": "2"})
    got_schema, got, meta = ocf_read(p)
    assert got == recs
    assert got_schema["name"] == "manifest_file"
    assert meta["format-version"] == "2"
    assert meta["avro.codec"] == "null"
    with open(p, "rb") as fh:
        assert fh.read(4) == AVRO_MAGIC


def test_ocf_empty_file_and_determinism(tmp_path):
    schema = {
        "type": "record",
        "name": "e",
        "fields": [{"name": "x", "type": "long"}],
    }
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "same.avro")
    ocf_write(p1, schema, [])
    _, got, _ = ocf_read(p1)
    assert got == []
    # same path+schema+records → byte-identical (deterministic staging)
    ocf_write(p2, schema, [{"x": 1}])
    b1 = open(p2, "rb").read()
    ocf_write(p2, schema, [{"x": 1}])
    assert open(p2, "rb").read() == b1


def test_ocf_deflate_read_path(tmp_path):
    """Hand-craft a deflate-codec OCF (what iceberg-java writes by
    default) and assert the reader inflates it."""
    schema = {
        "type": "record",
        "name": "d",
        "fields": [{"name": "x", "type": "long"}],
    }
    names: dict = {}
    sync = b"0123456789abcdef"
    out = bytearray(AVRO_MAGIC)
    encode_value(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"deflate",
        },
        out,
        names,
    )
    out += sync
    body = bytearray()
    for x in (11, 22, 33):
        _zz_encode(x, body)
    comp = zlib.compress(bytes(body))[2:-4]  # raw deflate: strip zlib wrap
    _zz_encode(3, out)
    _zz_encode(len(comp), out)
    out += comp
    out += sync
    p = str(tmp_path / "defl.avro")
    with open(p, "wb") as fh:
        fh.write(bytes(out))
    _, got, meta = ocf_read(p)
    assert got == [{"x": 11}, {"x": 22}, {"x": 33}]
    assert meta["avro.codec"] == "deflate"


def test_murmur3_spec_vectors():
    """The Iceberg spec's published bucket-hash vector (Appendix B):
    hash(34 as int) == hash(34 as long) == 2017239379 — ints are hashed
    as 8-byte little-endian longs so the transform is widening-stable.
    Negative values take the two's-complement long form."""
    from random_forest_using_hadoop_spark.iceberg_format import (
        iceberg_bucket_long,
        murmur3_32,
    )

    h = murmur3_32((34).to_bytes(8, "little"))
    assert (h if h < 1 << 31 else h - (1 << 32)) == 2017239379
    for v in (0, 34, -1, 123456789, -(1 << 40), (1 << 62)):
        b = iceberg_bucket_long(v, 16)
        assert 0 <= b < 16
    # reference murmur3_x86_32 sanity on a non-aligned input with tail
    assert murmur3_32(b"hello") == murmur3_32(b"hello")
    assert murmur3_32(b"hello") != murmur3_32(b"hellp")


def test_ocf_corruption_rejected(tmp_path):
    schema = {
        "type": "record",
        "name": "c",
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "c.avro")
    ocf_write(p, schema, [{"x": 1}])
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with open(p, "wb") as fh:
        fh.write(blob)
    with pytest.raises(ValueError, match="sync"):
        ocf_read(p)
    with open(p, "wb") as fh:
        fh.write(b"PAR1junk")
    with pytest.raises(ValueError, match="magic"):
        ocf_read(p)


def test_puffin_roundtrip_and_integrity():
    """Puffin container + deletion-vector-v1 blob codec: multi-blob
    round trip through footer coordinates; bit-flips and truncation
    fail loudly (CRC / framing); compressed footers are refused."""
    import struct
    import tempfile

    import pytest

    from random_forest_using_hadoop_spark.iceberg_format import (
        PUFFIN_MAGIC,
        iceberg_dv_blob,
        iceberg_dv_decode,
        puffin_read_blob,
        puffin_read_footer,
        puffin_write,
    )

    dvs = [[0, 5, 17, 70000], [2], list(range(0, 9000, 3))]
    path = tempfile.mktemp(suffix=".puffin")
    entries = puffin_write(
        path,
        [
            (
                iceberg_dv_blob(dv),
                {"type": "deletion-vector-v1", "properties": {"i": str(i)}},
            )
            for i, dv in enumerate(dvs)
        ],
    )
    footer = puffin_read_footer(path)
    assert [b["offset"] for b in footer["blobs"]] == [
        e["offset"] for e in entries
    ]
    for dv, b in zip(dvs, footer["blobs"]):
        blob = puffin_read_blob(path, b["offset"], b["length"])
        assert iceberg_dv_decode(blob) == sorted(set(dv))

    # corruption: flip one bitmap byte → CRC mismatch
    b0 = footer["blobs"][0]
    blob = bytearray(puffin_read_blob(path, b0["offset"], b0["length"]))
    blob[10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        iceberg_dv_decode(bytes(blob))
    # truncation → framing error
    good = puffin_read_blob(path, b0["offset"], b0["length"])
    with pytest.raises(ValueError, match="truncated"):
        iceberg_dv_decode(good[:-2])
    # compressed footer flag → loud refusal
    with open(path, "rb+") as fh:
        fh.seek(0, 2)
        end = fh.tell()
        fh.seek(end - 8)
        fh.write(struct.pack("<i", 1))
    with pytest.raises(ValueError, match="compressed"):
        puffin_read_footer(path)


def test_iceberg_dv_blob_is_delta_bitmap_compatible():
    """The spec chose Delta's RoaringBitmapArray serialization for v3
    DVs deliberately — the blob's payload section must be byte-equal to
    delta_format.dv_serialize for the same positions (one codec, two
    lakes)."""
    from random_forest_using_hadoop_spark.delta_format import dv_serialize
    from random_forest_using_hadoop_spark.iceberg_format import (
        iceberg_dv_blob,
    )

    rows = [1, 7, 4096, 2**33 + 5]
    blob = iceberg_dv_blob(rows)
    ser = dv_serialize(rows)
    assert blob[4 : 4 + len(ser)] == ser
