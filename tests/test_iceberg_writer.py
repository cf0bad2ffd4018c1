"""Jar-free Iceberg writer round-trips through the jar-free reader:
create/append/overwrite snapshots, time travel, snapshot listing,
metadata-chain conformance (field ids, version hint, manifest carry-
forward), and single-writer race refusal."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def test_create_append_overwrite_roundtrip(spark, tmp_path):
    table = str(tmp_path / "itab")
    s1 = iw.create_iceberg(_df(spark, 0, 3), table)
    assert ir.is_iceberg_table(table)
    assert {r.id for r in ir.read_iceberg(spark, table).collect()} == {0, 1, 2}

    s2 = iw.append_iceberg(_df(spark, 3, 5), table)
    assert {r.id for r in ir.read_iceberg(spark, table).collect()} == set(range(5))
    # time travel: the create snapshot still reads exactly
    assert {r.id for r in ir.read_iceberg(spark, table, snapshot_id=s1).collect()} == {0, 1, 2}

    s3 = iw.overwrite_iceberg(_df(spark, 9, 10), table)
    assert {r.id for r in ir.read_iceberg(spark, table).collect()} == {9}
    # all three snapshots remain listed, newest first
    snaps = ir.iceberg_snapshots(table)
    assert [s["snapshot_id"] for s in snaps] == [s3, s2, s1]
    assert snaps[0]["operation"] == "overwrite"
    # append-snapshot data is still time-travelable after the overwrite
    assert {r.id for r in ir.read_iceberg(spark, table, snapshot_id=s2).collect()} == set(range(5))


def test_metadata_chain_conformance(spark, tmp_path):
    table = str(tmp_path / "conform")
    iw.create_iceberg(_df(spark, 0, 2), table)
    iw.append_iceberg(_df(spark, 2, 3), table)
    md = os.path.join(table, "metadata")
    with open(os.path.join(md, "version-hint.text")) as fh:
        assert fh.read().strip() == "2"
    with open(os.path.join(md, "v2.metadata.json")) as fh:
        meta = json.load(fh)
    assert meta["format-version"] == 1
    assert meta["last-column-id"] == 2
    fields = meta["schema"]["fields"]
    assert [f["id"] for f in fields] == [1, 2]
    assert [f["type"] for f in fields] == ["long", "double"]
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert len(meta["snapshots"]) == 2
    assert len(meta["snapshot-log"]) == 2
    # the append's manifest list carries the create manifest forward
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    entries = list(ir._avro_records(spark, cur["manifest-list"]))
    assert len(entries) == 2
    # manifests carry per-file record counts from the parquet footers
    total = 0
    for e in entries:
        for rec in ir._avro_records(spark, str(e.get("manifest_path"))):
            total += int(str(rec.get("data_file").get("record_count")))
    assert total == 3


def test_create_existing_refused(spark, tmp_path):
    table = str(tmp_path / "dup")
    iw.create_iceberg(_df(spark, 0, 1), table)
    with pytest.raises(ValueError, match="already exists"):
        iw.create_iceberg(_df(spark, 0, 1), table)


def test_lost_metadata_race_raises(spark, tmp_path):
    """The put-if-absent primitive raises on a taken version, and a
    COMPETING writer's committed-but-unhinted version is ADOPTED (r8:
    `_current_metadata_file` scans past a lagging hint — trusting the
    stale hint starved the loser's retry loop in the two-process race
    test)."""
    import json as _json
    import shutil as _sh

    table = str(tmp_path / "race")
    iw.create_iceberg(_df(spark, 0, 2), table)
    md = os.path.join(table, "metadata")
    # a competing writer fully committed v2 (a real winner writes the
    # complete JSON before its atomic link) but its hint write lags
    _sh.copy(
        os.path.join(md, "v1.metadata.json"),
        os.path.join(md, "v2.metadata.json"),
    )
    # the primitive itself: linking a taken version must raise and
    # leave the existing file untouched
    meta, _v = iw._load_meta(table)
    before = open(os.path.join(md, "v2.metadata.json")).read()
    with pytest.raises(FileExistsError):
        iw._commit_metadata(table, meta, 2)
    assert open(os.path.join(md, "v2.metadata.json")).read() == before
    # an append sees the newest COMMITTED version (not the lagging
    # hint) and lands cleanly after it
    iw.append_iceberg(_df(spark, 2, 3), table)
    with open(os.path.join(md, "version-hint.text")) as fh:
        assert fh.read().strip() == "3"
    assert ir.read_iceberg(spark, table).count() == 3
    with open(os.path.join(md, "v3.metadata.json")) as fh:
        assert _json.load(fh)["current-snapshot-id"]


def test_append_schema_mismatch_refused(spark, tmp_path):
    table = str(tmp_path / "schm")
    iw.create_iceberg(_df(spark, 0, 1), table)
    with pytest.raises(ValueError, match="schema"):
        iw.append_iceberg(spark.range(1), table)


def test_schema_type_mapping_and_arrays(spark, tmp_path):
    table = str(tmp_path / "types")
    df = spark.createDataFrame(
        [(1, "a", True, [1.0, 2.0])],
        "id long, s string, b boolean, v array<double>",
    )
    iw.create_iceberg(df, table)
    with open(os.path.join(table, "metadata", "v1.metadata.json")) as fh:
        meta = json.load(fh)
    types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    assert types["s"] == "string" and types["b"] == "boolean"
    assert types["v"]["type"] == "list" and types["v"]["element"] == "double"
    # list element-id participates in last-column-id accounting
    assert meta["last-column-id"] == 5
    row = ir.read_iceberg(spark, table).collect()[0]
    assert row.v == [1.0, 2.0]
