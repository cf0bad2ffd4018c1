"""Per-version checksum sidecars (``{v}.crc``) — snapshot aggregates
(file count, byte size, DV count, current metadata+protocol)
maintained on every library commit, so "how big is this table" is an
O(1) read instead of an O(log) replay at scale.

Contracts: exact crc for every state-dependent commit (DML, DV,
OPTIMIZE, RESTORE — the writer has the replayed pre-state); exact
incremental crc for blind add-only appends; SKIP (never a wrong
number) when the chain can't be continued; ``write_version_checksum``
heals gaps; ``verify_checksum`` audits against a full replay;
``table_stats`` answers from the crc and falls back to replay.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _mk(spark, tmp_path, name="t", n=30):
    table = str(tmp_path / name)
    df = spark.range(n).select(
        "id", (F.col("id") % 5).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    ).repartition(3)
    dw.create_delta(df, table)
    return table


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 5).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    ).coalesce(1)


def test_create_and_append_maintain_chain(spark, tmp_path):
    table = _mk(spark, tmp_path)
    assert os.path.exists(dw.crc_path(table, 0))
    dw.append_delta(_batch(spark, 30, 40), table)
    dw.append_delta(_batch(spark, 40, 45), table)
    for v in (0, 1, 2):
        assert os.path.exists(dw.crc_path(table, v))
        rep = dw.verify_checksum(spark, table, v)
        assert rep["stored"] and rep["ok"], rep


def test_dml_and_dv_commits_are_exact(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dml.update_delta(spark, table, "id = 3", {"val": "99.0"})
    dml.delete_delta(spark, table, "id >= 25")
    delta_dv.delete_where_dv(spark, table, "id = 1")
    head = dw.verify_checksum(spark, table)
    assert head["stored"] and head["ok"], head
    import json

    with open(dw.crc_path(table, head["version"])) as fh:
        doc = json.load(fh)
    assert doc["numDeletionVectorsOpt"] == 1


def test_gap_heals_via_replayed_state(spark, tmp_path):
    table = _mk(spark, tmp_path)
    os.unlink(dw.crc_path(table, 0))
    # appends carry their replayed pre_state (since the ICT work every
    # library write path does) -> the crc is EXACT from that state and
    # a chain gap heals at the next commit instead of propagating
    dw.append_delta(_batch(spark, 30, 35), table)
    assert os.path.exists(dw.crc_path(table, 1))
    assert dw.verify_checksum(spark, table, 1)["ok"]
    # state-dependent commits stay exact too
    dml.delete_delta(spark, table, "id = 0")
    assert dw.verify_checksum(spark, table, 2)["ok"]
    # and the explicit writer backfills any version
    dw.write_version_checksum(spark, table, 0)
    assert dw.verify_checksum(spark, table, 0)["ok"]


def test_table_stats_crc_vs_replay(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.append_delta(_batch(spark, 30, 40), table)
    fast = dr.table_stats(spark, table)
    assert fast["source"] == "crc"
    os.unlink(dw.crc_path(table, fast["version"]))
    slow = dr.table_stats(spark, table)
    assert slow["source"] == "replay"
    for k in ("version", "numFiles", "tableSizeBytes",
              "numDeletionVectors"):
        assert fast[k] == slow[k], k


def test_optimize_and_restore_stay_consistent(spark, tmp_path):
    table = _mk(spark, tmp_path, n=60)
    dw.append_delta(_batch(spark, 60, 80), table)
    dw.compact_delta(spark, table, min_files=2)
    assert dw.verify_checksum(spark, table)["ok"]
    dw.restore_delta(spark, table, 1)
    rep = dw.verify_checksum(spark, table)
    assert rep["stored"] and rep["ok"], rep


def test_verify_detects_corruption(spark, tmp_path):
    table = _mk(spark, tmp_path)
    import json

    p = dw.crc_path(table, 0)
    with open(p) as fh:
        doc = json.load(fh)
    doc["numFiles"] += 1
    with open(p, "w") as fh:
        json.dump(doc, fh)
    rep = dw.verify_checksum(spark, table, 0)
    assert rep["stored"] and not rep["ok"]
    assert "numFiles" in rep["diff"]
