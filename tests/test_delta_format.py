"""Unit tests for the deletion-vector codec stack (delta_format.py):
Z85 armor, 32-bit roaring serialization, and the Delta portable
RoaringBitmapArray — self-consistency across all container types plus
the published Z85 test vector (no Spark session needed)."""

from __future__ import annotations

import struct

import pytest

from random_forest_using_hadoop_spark.delta_format import (
    DV_FILE_FORMAT_VERSION,
    DV_MAGIC,
    dv_deserialize,
    dv_inline_descriptor,
    dv_on_disk_descriptors,
    dv_read,
    dv_read_inline,
    dv_resolve_path,
    dv_serialize,
    roaring32_deserialize,
    roaring32_serialize,
    z85_decode,
    z85_encode,
)


def test_z85_published_vector():
    # ZeroMQ RFC 32's normative example: this 8-byte sequence encodes
    # to the string "HelloWorld"
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_z85_roundtrip_and_alignment():
    data = bytes(range(256)) * 2  # 512 bytes, 4-aligned
    assert z85_decode(z85_encode(data)) == data
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not 4-aligned
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not 5-aligned


def test_roaring_array_container_roundtrip():
    vals = [0, 1, 2, 1000, 65535, 65536, 70000, (1 << 32) - 1]
    ser = roaring32_serialize(vals)
    got, end = roaring32_deserialize(ser)
    assert got == sorted(set(vals))
    assert end == len(ser)


def test_roaring_bitmap_container_roundtrip():
    # >4096 values in one 16-bit key space forces a bitmap container
    dense = list(range(0, 60000, 3))
    assert len([v for v in dense if v < 65536]) > 4096
    ser = roaring32_serialize(dense)
    got, _ = roaring32_deserialize(ser)
    assert got == dense


def test_roaring_mixed_containers_roundtrip():
    vals = sorted(set(range(0, 30000, 2)) | {65536 + i for i in range(10)})
    got, _ = roaring32_deserialize(roaring32_serialize(vals))
    assert got == vals


def test_roaring_run_container_read_path():
    """The serializer never emits runs, but foreign writers do — craft
    a cookie-12347 bitmap with one run container by hand and assert the
    reader expands it. Layout per RoaringFormatSpec: 16-bit cookie
    12347 | (size-1)<<16, run-flag bitset, (key, card-1) header, no
    offsets below the 4-container threshold, then per-run
    (start, length-1) pairs."""
    size = 1
    data = struct.pack("<I", 12347 | ((size - 1) << 16))
    data += bytes([0b1])  # container 0 is a run container
    card = 5  # values 10..14
    data += struct.pack("<HH", 0, card - 1)  # key 0, cardinality 5
    data += struct.pack("<H", 1)  # one run
    data += struct.pack("<HH", 10, 4)  # start 10, length-1 = 4
    got, end = roaring32_deserialize(data)
    assert got == [10, 11, 12, 13, 14]
    assert end == len(data)


def test_dv_portable_format_layout():
    idx = [3, 7, (1 << 32) + 1]
    raw = dv_serialize(idx)
    (magic,) = struct.unpack_from("<i", raw, 0)
    (n_bitmaps,) = struct.unpack_from("<q", raw, 4)
    assert magic == DV_MAGIC
    assert n_bitmaps == 2  # keys 0 and 1 populated
    assert dv_deserialize(raw) == sorted(idx)


def test_dv_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        dv_deserialize(struct.pack("<iq", 123, 0))


def test_dv_inline_descriptor_roundtrip():
    idx = [0, 5, 123456, (1 << 33) + 17]
    d = dv_inline_descriptor(idx)
    assert d["storageType"] == "i"
    assert d["cardinality"] == len(idx)
    assert len(d["pathOrInlineDv"]) % 5 == 0  # Z85-aligned armor
    assert dv_read_inline(d) == sorted(idx)


def test_dv_inline_descriptor_detects_corruption():
    d = dv_inline_descriptor([1, 2, 3])
    d["cardinality"] = 7
    with pytest.raises(ValueError, match="cardinality"):
        dv_read_inline(d)


def test_dv_path_storage_rejected_with_rationale():
    with pytest.raises(ValueError, match="inline"):
        dv_read_inline(
            {
                "storageType": "u",
                "pathOrInlineDv": "ab/cdef",
                "sizeInBytes": 0,
                "cardinality": 0,
            }
        )


def test_z85_bad_character_raises_valueerror():
    # corrupt armor must surface as the module's ValueError contract,
    # never a bare KeyError ("~" is outside the Z85 alphabet)
    with pytest.raises(ValueError, match="Z85"):
        z85_decode("abcd~")


def test_dv_dense_key_layout():
    """A DV whose only populated high-32 key is 2 must still emit keys
    0,1,2 (empty bitmaps for the gap) — the reference writer's dense
    sequential-array layout."""
    idx = [(2 << 32) + 7]
    raw = dv_serialize(idx)
    (n_bitmaps,) = struct.unpack_from("<q", raw, 4)
    assert n_bitmaps == 3
    assert dv_deserialize(raw) == idx


def test_dv_on_disk_roundtrip_with_prefix(tmp_path):
    """storageType "u" end to end: two DVs packed into ONE spec-layout
    file under a random-style prefix directory; each descriptor's
    offset/size/CRC must check out and decode back to its own rows."""
    root = str(tmp_path)
    dvs = [[0, 5, 17, 4096], list(range(0, 9000, 2))]
    descs = dv_on_disk_descriptors(
        dvs, root, prefix="ab", uuid_hex="0123456789abcdef0123456789abcdef"
    )
    assert [d["storageType"] for d in descs] == ["u", "u"]
    # both descriptors point into the SAME file (one write per commit)
    p0 = dv_resolve_path(descs[0], root)
    assert p0 == dv_resolve_path(descs[1], root)
    assert "/ab/deletion_vector_" in p0 and p0.endswith(".bin")
    with open(p0, "rb") as fh:
        assert fh.read(1)[0] == DV_FILE_FORMAT_VERSION
    for d, idx in zip(descs, dvs):
        assert dv_read(d, root) == sorted(set(idx))


def test_dv_on_disk_integrity_checks(tmp_path):
    """Corruption must fail loudly: a flipped data byte breaks the CRC;
    a descriptor pointing at the wrong offset breaks the size check."""
    root = str(tmp_path)
    (d,) = dv_on_disk_descriptors(
        [[1, 2, 3, 70000]], root, uuid_hex="00112233445566778899aabbccddeeff"
    )
    path = dv_resolve_path(d, root)
    blob = bytearray(open(path, "rb").read())
    blob[d["offset"] + 4 + 2] ^= 0xFF  # flip a data byte
    with open(path, "wb") as fh:
        fh.write(blob)
    with pytest.raises(ValueError, match="checksum"):
        dv_read(d, root)
    bad = dict(d, offset=d["offset"] + 1)
    with pytest.raises(ValueError):
        dv_read(bad, root)


def test_dv_absolute_path_storage(tmp_path):
    """storageType "p": pathOrInlineDv IS the absolute path."""
    from random_forest_using_hadoop_spark.delta_format import dv_file_write

    path = str(tmp_path / "dv_abs.bin")
    (meta,) = dv_file_write([[3, 9, 12]], path)
    desc = {"storageType": "p", "pathOrInlineDv": path, **meta}
    assert dv_read(desc) == [3, 9, 12]


def test_dv_on_disk_seeded_random_roundtrips(tmp_path):
    """Seeded randomized roundtrips for the FILE-based codec, beside
    the inline one: multi-DV files, container-boundary cardinalities,
    64-bit spill, prefixed and unprefixed paths."""
    import random

    rng = random.Random(20260816)
    for trial in range(6):
        n_dvs = rng.choice([1, 2, 4])
        dvs = []
        for _ in range(n_dvs):
            n = rng.choice([0, 1, 100, 4096, 4097, 15000])
            span = rng.choice([1 << 12, 1 << 16, 1 << 20, 1 << 33])
            dvs.append(sorted(rng.sample(range(span), min(n, span))))
        prefix = rng.choice(["", "Qx"])
        root = str(tmp_path / f"t{trial}")
        descs = dv_on_disk_descriptors(
            dvs, root, prefix=prefix, uuid_hex=f"{rng.getrandbits(128):032x}"
        )
        for d, idx in zip(descs, dvs):
            assert dv_read(d, root) == idx, (trial, prefix, len(idx))


def test_roaring_input_validation():
    with pytest.raises(ValueError):
        roaring32_serialize([-1])
    with pytest.raises(ValueError):
        roaring32_serialize([1 << 32])
    with pytest.raises(ValueError):
        dv_serialize([-5])


def test_dv_seeded_random_roundtrips():
    """Seeded randomized roundtrips across the container-type
    boundaries (sparse arrays, dense bitmaps, multi-key, 64-bit
    spill) — any asymmetry between the serializer's container choice
    and the deserializer's reading rule shows up here."""
    import random

    rng = random.Random(20260815)
    for trial in range(8):
        n = rng.choice([0, 1, 100, 4096, 4097, 20000])
        span = rng.choice([1 << 12, 1 << 16, 1 << 20, 1 << 33])
        idx = sorted(rng.sample(range(span), min(n, span)))
        assert dv_deserialize(dv_serialize(idx)) == idx, (trial, n, span)
        d = dv_inline_descriptor(idx)
        assert dv_read_inline(d) == idx, (trial, n, span)


def test_dv_missing_offset_single_vs_multi_blob(tmp_path):
    """A descriptor WITHOUT an offset is only unambiguous on a
    single-blob file: there it reads blob 0; on a multi-DV file the
    reader must refuse instead of silently decoding the FIRST blob
    (whose CRC passes and whose cardinality can coincide)."""
    from random_forest_using_hadoop_spark.delta_format import dv_file_write

    single = str(tmp_path / "dv_single.bin")
    (meta,) = dv_file_write([[2, 4, 8]], single)
    desc = {"storageType": "p", "pathOrInlineDv": single, **meta}
    desc.pop("offset")
    assert dv_read(desc) == [2, 4, 8]

    multi = str(tmp_path / "dv_multi.bin")
    # same first blob so cardinality/CRC coincide — the trap the gate closes
    m0, _ = dv_file_write([[2, 4, 8], [1, 3]], multi)
    bad = {"storageType": "p", "pathOrInlineDv": multi, **m0}
    bad.pop("offset")
    with pytest.raises(ValueError, match="single-blob"):
        dv_read(bad)
