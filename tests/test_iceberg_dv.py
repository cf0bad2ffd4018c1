"""Iceberg v3-style DELETION VECTORS (``iceberg_mor.delete_where_dv``
+ the Puffin ``deletion-vector-v1`` blob codec): value correctness,
blob/framing integrity (magic + CRC verified loudly), minimality of
re-deletes, coexistence with parquet position + equality deletes,
sequence-number semantics, and compaction folding DVs away. The
roaring64 byte conformance itself is pinned in test_roaring.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_mor as mor
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.plans import puffin


def _mk(spark, tmp_path, n=40, parts=4):
    table = str(tmp_path / "t")
    df = spark.range(n).select(
        "id", (F.col("id") % 5).alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    ).repartition(parts)
    iw.create_iceberg(df, table, format_version=2)
    return table


def test_dv_blob_codec_roundtrip_and_integrity():
    pos = [0, 1, 5, 2**33, 2**33 + 7]
    blob = puffin.dv_blob_encode(pos)
    assert puffin.dv_blob_decode(blob) == sorted(set(pos))
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        puffin.dv_blob_decode(bytes(bad))
    bad2 = bytearray(blob)
    bad2[4] ^= 0xFF  # first magic byte
    with pytest.raises(ValueError, match="magic"):
        puffin.dv_blob_decode(bytes(bad2))


def test_delete_where_dv_values(spark, tmp_path):
    table = _mk(spark, tmp_path)
    mor.delete_where_dv(spark, table, "id % 4 = 0")
    got = sorted(r.id for r in ir.read_iceberg(spark, table).collect())
    assert got == [i for i in range(40) if i % 4 != 0]
    # manifest entries: PUFFIN position deletes with v3 reference
    # fields; ONE puffin file, one blob per touched data file
    meta, _ = iw._load_meta(table)
    snaps = {int(s["snapshot-id"]): s for s in meta["snapshots"]}
    cur = snaps[int(meta["current-snapshot-id"])]
    _data, pos_dels, _eq = ir._snapshot_entries(
        spark, cur, iw._spec_fields(meta)
    )
    assert pos_dels and all(
        e["format"] == "PUFFIN" for e in pos_dels
    )
    paths = {e["path"] for e in pos_dels}
    assert len(paths) == 1 and next(iter(paths)).endswith(".puffin")
    refs = {e["referenced"] for e in pos_dels}
    assert len(refs) == len(pos_dels)  # one DV per referenced file
    footer, payloads = puffin.read_puffin(next(iter(paths)))
    assert all(
        b["type"] == "deletion-vector-v1" for b in footer["blobs"]
    )
    card = sum(
        int(b["properties"]["cardinality"]) for b in footer["blobs"]
    )
    assert card == 10


def test_redelete_is_minimal_and_noop(spark, tmp_path):
    table = _mk(spark, tmp_path)
    s1 = mor.delete_where_dv(spark, table, "id < 10")
    # the same predicate again: already-deleted rows are subtracted
    # before matching, so nothing new to record — a no-op
    s2 = mor.delete_where_dv(spark, table, "id < 10")
    assert s2 == s1
    # a WIDER delete only records the new rows
    mor.delete_where_dv(spark, table, "id < 15")
    meta, _ = iw._load_meta(table)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert cur["summary"]["added-position-deletes"] == "5"
    got = sorted(r.id for r in ir.read_iceberg(spark, table).collect())
    assert got == list(range(15, 40))


def test_dv_coexists_with_parquet_and_equality_deletes(spark, tmp_path):
    table = _mk(spark, tmp_path)
    mor.delete_where_mor(spark, table, "id = 0")  # parquet pos delete
    mor.delete_keys_mor(
        spark, table,
        spark.createDataFrame([(1,)], "id long"),
    )  # equality delete
    mor.delete_where_dv(spark, table, "id = 2")  # DV
    got = sorted(r.id for r in ir.read_iceberg(spark, table).collect())
    assert got == list(range(3, 40))


def test_dv_sequence_semantics_data_after_delete_survives(spark, tmp_path):
    table = _mk(spark, tmp_path, n=20)
    mor.delete_where_dv(spark, table, "id >= 10")
    # rows APPENDED after the DV commit are untouched even if the same
    # file positions repeat (position deletes apply to seq <= delete)
    iw.append_iceberg(
        spark.range(100, 110).select(
            "id", (F.col("id") % 5).alias("grp"),
            (F.col("id") * 2.0).alias("val"),
        ).coalesce(1),
        table,
    )
    got = sorted(r.id for r in ir.read_iceberg(spark, table).collect())
    assert got == list(range(10)) + list(range(100, 110))


def test_compact_folds_dvs_away(spark, tmp_path):
    table = _mk(spark, tmp_path)
    mor.delete_where_dv(spark, table, "id % 3 = 0")
    before = sorted(
        r.id for r in ir.read_iceberg(spark, table).collect()
    )
    mor.compact_mor(spark, table)
    after = sorted(
        r.id for r in ir.read_iceberg(spark, table).collect()
    )
    assert after == before
    meta, _ = iw._load_meta(table)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _data, pos_dels, eq = ir._snapshot_entries(
        spark, cur, iw._spec_fields(meta)
    )
    assert not pos_dels and not eq


def test_dv_requires_v2(spark, tmp_path):
    table = str(tmp_path / "v1")
    iw.create_iceberg(spark.range(5), table, format_version=1)
    with pytest.raises(Exception, match="format-version|v2"):
        mor.delete_where_dv(spark, table, "id = 1")
