"""The pure-Python Avro container decoder agrees with the JVM Avro
library byte-for-byte across the type surface Iceberg metadata uses —
including types our own writer never emits but real runtimes do
(maps, fixed, enums, deflate blocks, multi-block files)."""

from __future__ import annotations

import json
import os

import pytest

from dst_spark_k8_lakehouse_spark.plans import avro_codec

SCHEMA = {
    "type": "record",
    "name": "kitchen",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "u", "type": ["null", "int"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 4}},
        {
            "name": "e",
            "type": {"type": "enum", "name": "col",
                     "symbols": ["RED", "GREEN", "BLUE"]},
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
        {"name": "again", "type": "inner"},  # named-type reference
    ],
}


def _write_with_jvm(spark, path: str, codec: str, n: int) -> None:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    if codec == "deflate":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(schema, jvm.java.io.File(path))
    inner_schema = schema.getField("nested").schema()
    fx_schema = schema.getField("fx").schema()
    e_schema = schema.getField("e").schema()
    jfloat = jvm.java.lang.Float.valueOf
    for i in range(n):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("i", i)
        rec.put("l", (i + 1) * 10_000_000_000)  # > int32: py4j sends Long
        rec.put("f", jfloat(float(i) / 2))
        rec.put("d", float(i) / 3)
        rec.put("b", i % 2 == 0)
        rec.put("s", f"s{i}·π")  # non-ascii utf-8
        rec.put("by", jvm.java.nio.ByteBuffer.wrap(bytes([i % 256] * 3)))
        rec.put("u", None if i % 3 == 0 else i)
        arr = jvm.java.util.ArrayList()
        for j in range(i % 4):
            arr.add(j)
        rec.put("arr", arr)
        m = jvm.java.util.HashMap()
        m.put(f"k{i}", f"v{i}")
        rec.put("m", m)
        rec.put(
            "fx",
            jvm.org.apache.avro.generic.GenericData.Fixed(
                fx_schema, bytes([1, 2, 3, i % 256])
            ),
        )
        rec.put(
            "e",
            jvm.org.apache.avro.generic.GenericData.EnumSymbol(
                e_schema, ["RED", "GREEN", "BLUE"][i % 3]
            ),
        )
        inner = jvm.org.apache.avro.generic.GenericData.Record(inner_schema)
        inner.put("x", i * 7)
        rec.put("nested", inner)
        inner2 = jvm.org.apache.avro.generic.GenericData.Record(inner_schema)
        inner2.put("x", i * 11)
        rec.put("again", inner2)
        w.append(rec)
        if i == n // 2:
            w.sync()  # force a second block
    w.close()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_kitchen_sink_roundtrip(spark, tmp_path, codec):
    p = str(tmp_path / f"k-{codec}.avro")
    _write_with_jvm(spark, p, codec, 201)
    rows = avro_codec.read_avro_file(p)
    assert len(rows) == 201
    for i in (0, 1, 100, 200):
        r = rows[i]
        assert r["i"] == i and r["l"] == (i + 1) * 10_000_000_000
        assert r["f"] == pytest.approx(i / 2, rel=1e-6)
        assert r["d"] == i / 3
        assert r["b"] is (i % 2 == 0)
        assert r["s"] == f"s{i}·π"
        assert r["by"] == bytes([i % 256] * 3)
        assert r["u"] == (None if i % 3 == 0 else i)
        assert r["arr"] == list(range(i % 4))
        assert r["m"] == {f"k{i}": f"v{i}"}
        assert r["fx"] == bytes([1, 2, 3, i % 256])
        assert r["e"] == ["RED", "GREEN", "BLUE"][i % 3]
        assert r["nested"] == {"x": i * 7}
        assert r["again"] == {"x": i * 11}


def test_not_avro_raises(tmp_path):
    p = str(tmp_path / "x")
    with open(p, "wb") as fh:
        fh.write(b"PAR1 not avro")
    with pytest.raises(ValueError, match="not an Avro container"):
        avro_codec.read_avro_file(p)


def test_python_writer_roundtrips_through_python_reader(tmp_path):
    p = str(tmp_path / "w.avro")
    rows = [
        {
            "i": i, "l": (i + 1) * 10_000_000_000, "f": i / 2.0,
            "d": i / 3.0, "b": i % 2 == 0, "s": f"s{i}·π",
            "by": bytes([i % 256] * 3),
            "u": None if i % 3 == 0 else i,
            "arr": list(range(i % 4)), "m": {f"k{i}": f"v{i}"},
            "fx": bytes([1, 2, 3, i % 256]),
            "e": ["RED", "GREEN", "BLUE"][i % 3],
            "nested": {"x": i * 7}, "again": {"x": i * 11},
        }
        for i in range(2500)  # > one 1000-record block
    ]
    avro_codec.write_avro_file(p, json.dumps(SCHEMA), rows)
    back = avro_codec.read_avro_file(p)
    assert len(back) == 2500
    for i in (0, 999, 1000, 2499):
        want = dict(rows[i])
        want["f"] = pytest.approx(want["f"], rel=1e-6)
        assert back[i] == want


def test_python_writer_readable_by_jvm(spark, tmp_path):
    """Cross-engine conformance in the OTHER direction: files this
    writer produces must parse in the reference implementation."""
    p = str(tmp_path / "w2.avro")
    rows = [
        {
            "i": i, "l": (i + 1) * 10_000_000_000, "f": 0.5, "d": 0.25,
            "b": True, "s": f"x{i}", "by": b"ab",
            "u": i if i % 2 else None, "arr": [1, 2], "m": {"a": "b"},
            "fx": b"\x01\x02\x03\x04", "e": "GREEN",
            "nested": {"x": 1}, "again": {"x": 2},
        }
        for i in range(50)
    ]
    avro_codec.write_avro_file(p, json.dumps(SCHEMA), rows)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while reader.hasNext():
        rec = reader.next()
        i = int(str(rec.get("i")))
        assert str(rec.get("s")) == f"x{i}"
        assert int(str(rec.get("l"))) == (i + 1) * 10_000_000_000
        assert str(rec.get("e")) == "GREEN"
        assert int(str(rec.get("nested").get("x"))) == 1
        n += 1
    reader.close()
    assert n == 50


def test_property_roundtrip_random_records(tmp_path):
    """Property: arbitrary values of the manifest-relevant types
    survive a python-write → python-read round trip exactly."""
    from hypothesis import given, settings, strategies as st

    schema = {
        "type": "record",
        "name": "prop",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "string"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
        ],
    }
    longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    rec = st.fixed_dictionaries(
        {
            "l": longs,
            "s": st.text(max_size=40),
            "u": st.none() | st.text(max_size=10),
            "arr": st.lists(longs, max_size=5),
            "m": st.dictionaries(st.text(max_size=8), longs, max_size=4),
            "b": st.booleans(),
            "d": st.floats(allow_nan=False),
        }
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec, max_size=20))
    def roundtrip(rows):
        p = str(tmp_path / "prop.avro")
        avro_codec.write_avro_file(p, json.dumps(schema), rows)
        assert avro_codec.read_avro_file(p) == rows

    roundtrip()


def test_compiled_decoder_equals_interpreted(tmp_path):
    """The compiled closure-tree decoder (r8 fast path) and the
    interpreted reference produce IDENTICAL output on every shape the
    Iceberg metadata surface uses — unions, nested records, bounds
    maps (negative skippable block counts included), arrays, fixed,
    enum, both codecs."""
    import json
    import zlib

    from dst_spark_k8_lakehouse_spark.plans import avro_codec as ac

    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "bs", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {
                "type": "map", "values": ["null", "bytes"]}},
            {"name": "sub", "type": {
                "type": "record", "name": "sub",
                "fields": [{"name": "x", "type": "int"}]}},
            {"name": "sub2", "type": ["null", "sub"], "default": None},
        ],
    })
    rows = [
        {"s": f"row{i}", "n": None if i % 3 == 0 else i * 12345,
         "b": i % 2 == 0, "d": i / 7.0, "bs": bytes([i % 256]) * (i % 9),
         "arr": list(range(i % 5)),
         "m": {f"k{j}": (None if j % 2 else bytes([j])) for j in range(i % 4)},
         "sub": {"x": -i}, "sub2": None if i % 2 else {"x": i}}
        for i in range(500)
    ]
    p = str(tmp_path / "t.avro")
    ac.write_avro_file(p, schema, rows)
    fast = ac.read_avro_file(p, compiled=True)
    slow = ac.read_avro_file(p, compiled=False)
    assert fast == slow == rows
    # deflate blocks run through the same fast path
    raw = open(p, "rb").read()
    # rewrite with deflate by hand: decode then re-encode via writer?
    # simpler: flip the codec by writing a deflate container directly
    import io
    buf = io.BytesIO(raw)
    assert buf.read(4) == b"Obj\x01"
    meta = ac._decode({"type": "map", "values": "bytes"}, buf, {})
    sync = buf.read(16)
    n = ac._read_long(buf)
    block = ac._read_bytes(buf)
    out = bytearray()
    out += b"Obj\x01"
    meta["avro.codec"] = b"deflate"
    ac._encode({"type": "map", "values": "bytes"}, meta, out, {})
    out += sync
    co = zlib.compressobj(wbits=-15)
    dblock = co.compress(bytes(block)) + co.flush()
    ac._put_long(out, n)
    ac._put_bytes(out, dblock)
    out += sync
    p2 = str(tmp_path / "t2.avro")
    open(p2, "wb").write(bytes(out))
    assert ac.read_avro_file(p2, compiled=True) == rows


def test_compiled_decoder_edge_values(tmp_path):
    """Varint edges through the compiled path: int64 extremes, zero,
    alternating signs, empty strings/bytes/arrays/maps."""
    import json

    from dst_spark_k8_lakehouse_spark.plans import avro_codec as ac

    schema = json.dumps({
        "type": "record", "name": "e",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    })
    edge = [-(2**63), -(2**63) + 1, -1, 0, 1, 63, 64, -64, -65,
            2**63 - 1, 2**31, -(2**31) - 1]
    rows = [
        {"v": v, "s": "", "b": b"", "a": edge, "m": {}} for v in edge
    ]
    p = str(tmp_path / "e.avro")
    ac.write_avro_file(p, schema, rows)
    assert ac.read_avro_file(p, compiled=True) == rows
    assert ac.read_avro_file(p, compiled=False) == rows
