"""RESTORE / rollback: Delta `RESTORE TABLE ... VERSION AS OF` as one
history-preserving commit; Iceberg `rollback_to_snapshot` as a
metadata pointer move. Both refuse when the target's files are gone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def _ids(spark, t, **kw):
    return {r.id for r in dr.read_delta(spark, t, **kw).collect()}


def test_delta_restore_preserves_history(spark, tmp_path):
    t = str(tmp_path / "r")
    dw.create_delta(_df(spark, 0, 10), t)          # v0
    dw.append_delta(_df(spark, 10, 15), t)         # v1
    dml.delete_delta(spark, t, "id < 3")           # v2
    v = dw.restore_delta(spark, t, 0)              # v3
    assert v == 3
    assert _ids(spark, t) == set(range(10))
    # pre-restore state stays time-travelable
    assert _ids(spark, t, version=2) == set(range(3, 15))
    assert _ids(spark, t, version=1) == set(range(15))
    # restoring to the current state is a no-op (no commit)
    assert dw.restore_delta(spark, t, 3) == 3


def test_delta_restore_reinstates_dv_descriptors(spark, tmp_path):
    t = str(tmp_path / "rdv")
    dw.create_delta(_df(spark, 0, 10).coalesce(1), t)   # v0
    delta_dv.delete_where_dv(spark, t, "id < 4")        # v1
    dw.append_delta(_df(spark, 10, 12), t)              # v2
    dw.restore_delta(spark, t, 1)                       # v3
    # the DV-carrying add came back verbatim: deletes still applied
    assert _ids(spark, t) == set(range(4, 10))
    assert delta_dv.dv_stats(spark, t)["vectored_files"] == 1
    dw.restore_delta(spark, t, 0)                       # v4: pre-DV
    assert _ids(spark, t) == set(range(10))


def test_delta_restore_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "rs")
    dw.create_delta(_df(spark, 0, 5), t)               # v0
    dw.add_column(spark, t, "extra", "string")         # v1
    assert "extra" in dr.read_delta(spark, t).columns
    dw.restore_delta(spark, t, 0)
    assert "extra" not in dr.read_delta(spark, t).columns


def test_delta_restore_past_vacuum_raises(spark, tmp_path):
    t = str(tmp_path / "rv")
    dw.create_delta(_df(spark, 0, 10).coalesce(1), t)  # v0
    dw.overwrite_delta(_df(spark, 100, 105), t)        # v1
    dw.vacuum_delta(spark, t, retain_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        dw.restore_delta(spark, t, 0)


def test_iceberg_rollback(spark, tmp_path):
    t = str(tmp_path / "ib")
    s1 = iw.create_iceberg(_df(spark, 0, 8), t)
    s2 = iw.overwrite_iceberg(_df(spark, 100, 103), t)
    iw.rollback_iceberg(spark, t, s1)
    got = {r.id for r in ir.read_iceberg(spark, t).collect()}
    assert got == set(range(8))
    # both snapshots remain; the overwrite is still travelable
    snaps = {s["snapshot_id"] for s in ir.iceberg_snapshots(t)}
    assert snaps == {s1, s2}
    assert {
        r.id for r in ir.read_iceberg(spark, t, snapshot_id=s2).collect()
    } == {100, 101, 102}
    with pytest.raises(ValueError, match="not in table"):
        iw.rollback_iceberg(spark, t, 42)


def test_iceberg_rollback_after_expire_raises(spark, tmp_path):
    t = str(tmp_path / "ibe")
    s1 = iw.create_iceberg(_df(spark, 0, 5).coalesce(1), t)
    iw.overwrite_iceberg(_df(spark, 9, 11), t)
    iw.expire_snapshots(spark, t, retain_last=1)
    with pytest.raises(ValueError):
        iw.rollback_iceberg(spark, t, s1)
