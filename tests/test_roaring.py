"""Roaring codec conformance: byte-compare the pure-Python 32-bit
serialization against the REFERENCE implementation
(``org.roaringbitmap`` 1.3.0, bundled with Spark) in both directions,
plus run-container reads, the 64-bit Delta array layout, Z85 (spec
test vector), and DV-file framing (CRC verified loudly)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dst_spark_k8_lakehouse_spark.plans import roaring as R


def _as_jint(v: int) -> int:
    """uint32 → Java signed int bit pattern (RoaringBitmap treats
    ints as unsigned)."""
    return v - (1 << 32) if v >= (1 << 31) else v


def _java_serialize(spark, values) -> bytes:
    jvm = spark._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in values:
        rb.add(_as_jint(v))
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    return bytes(baos.toByteArray())


def _java_deserialize(spark, data: bytes) -> list[int]:
    jvm = spark._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    rb.deserialize(
        jvm.java.io.DataInputStream(jvm.java.io.ByteArrayInputStream(data))
    )
    return [v & 0xFFFFFFFF for v in rb.toArray()]


CASES = [
    [],
    [0],
    [1, 2, 3, 100000, 1 << 31, (1 << 32) - 1],
    list(range(5000)),                      # bitmap container
    list(range(0, 1 << 20, 7)),             # many containers
    [i * 65536 for i in range(300)],        # 300 single-value containers
]


@pytest.mark.parametrize("vals", CASES)
def test_serialize_matches_reference_bytes(spark, vals):
    assert R.serialize_roaring32(vals) == _java_serialize(spark, vals)


@pytest.mark.parametrize("vals", CASES)
def test_reference_deserializes_our_bytes(spark, vals):
    got = _java_deserialize(spark, R.serialize_roaring32(vals))
    assert got == sorted(set(vals))


def test_we_read_run_optimized_reference_bytes(spark):
    """Real writers runOptimize: dense ranges become run containers
    (cookie 12347), which our writer never emits but our reader must
    parse."""
    jvm = spark._jvm
    vals = list(range(1000, 9000)) + [70000, 70001, 70002] + [1 << 20]
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in vals:
        rb.add(v)
    assert rb.runOptimize()  # must actually produce run containers
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    got, off = R.deserialize_roaring32(bytes(baos.toByteArray()))
    assert got == sorted(set(vals))
    assert off == baos.size()


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=(1 << 32) - 1),
               max_size=300))
def test_roaring32_roundtrip_property(vals):
    data = R.serialize_roaring32(vals)
    got, off = R.deserialize_roaring32(data)
    assert got == sorted(vals)
    assert off == len(data)


def test_rbm_array_roundtrip_dense_keys():
    # values above 2^32 force multiple buckets; bucket 1 empty —
    # dense layout must serialize it anyway (index = key)
    vals = [0, 5, (2 << 32) + 7, (2 << 32) + 8, (3 << 32)]
    data = R.serialize_rbm_array(vals)
    (magic,) = struct.unpack_from("<i", data, 0)
    (n,) = struct.unpack_from("<Q", data, 4)
    assert magic == R.RBM_ARRAY_MAGIC
    assert n == 4
    assert R.deserialize_rbm_array(data) == sorted(vals)


def test_rbm_array_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_rbm_array(b"\x00\x00\x00\x00" + b"\x00" * 8)


def test_z85_spec_vector():
    # the ZeroMQ spec's reference test case
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert R.z85_encode(data) == "HelloWorld"
    assert R.z85_decode("HelloWorld") == data


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip(data):
    assert R.z85_decode(R.z85_encode(data)) == data


def test_dv_file_framing_and_crc(tmp_path):
    p = str(tmp_path / "dv.bin")
    b1 = R.serialize_rbm_array([1, 2, 3])
    b2 = R.serialize_rbm_array([10, (1 << 33) + 4])
    spans = R.append_dv_blobs(p, [b1, b2])
    assert spans[0][0] == 1  # first blob right after the version byte
    for (off, size), blob in zip(spans, [b1, b2]):
        assert R.read_dv_blob(p, off, size) == blob
    # corrupt one data byte: CRC must catch it
    with open(p, "r+b") as fh:
        fh.seek(spans[1][0] + 4 + 2)
        orig = fh.read(1)
        fh.seek(spans[1][0] + 4 + 2)
        fh.write(bytes([orig[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="CRC"):
        R.read_dv_blob(p, spans[1][0], spans[1][1])
    # size mismatch vs descriptor is caught before CRC
    with pytest.raises(ValueError, match="sizeInBytes"):
        R.read_dv_blob(p, spans[0][0], spans[0][1] + 1)


# ----------------------------------------- portable 64-bit (Iceberg v3 DVs)


def _java64_serialize(spark, values) -> bytes:
    jvm = spark._jvm
    rb = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    for v in values:
        rb.addLong(v - (1 << 64) if v >= (1 << 63) else v)
    rb.runOptimize()
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serializePortable(jvm.java.io.DataOutputStream(baos))
    return bytes(baos.toByteArray())


def _java64_deserialize(spark, data: bytes) -> list[int]:
    jvm = spark._jvm
    rb = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    rb.deserializePortable(
        jvm.java.io.DataInputStream(jvm.java.io.ByteArrayInputStream(data))
    )
    return [v & ((1 << 64) - 1) for v in rb.toArray()]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 63) - 1),
        max_size=300,
    )
)
def test_roaring64_portable_serialize_matches_java(spark, values):
    ours = R.serialize_roaring64_portable(sorted(set(values)))
    theirs = _java64_serialize(spark, set(values))
    assert ours == theirs


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 63) - 1),
        max_size=300,
    )
)
def test_roaring64_portable_java_roundtrips_ours(spark, values):
    vals = sorted(set(values))
    blob = R.serialize_roaring64_portable(vals)
    assert _java64_deserialize(spark, blob) == vals
    assert R.deserialize_roaring64_portable(
        _java64_serialize(spark, set(values))
    ) == vals


def test_roaring64_portable_rejects_trailing_garbage():
    blob = R.serialize_roaring64_portable([1, 2, 3]) + b"x"
    with pytest.raises(ValueError, match="trailing"):
        R.deserialize_roaring64_portable(blob)
