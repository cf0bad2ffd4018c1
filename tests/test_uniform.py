"""Format bridge: one copy of parquet readable as BOTH Delta and
Iceberg. Delta→Iceberg metadata export (UniForm layout, snapshot per
sync, time travel across syncs) and Iceberg→Delta log export
(incremental add/remove diffs), with loud refusals where the exported
view would lie (deletion vectors, column mapping, Hive partitioning,
merge-on-read deletes)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.plans import uniform


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def _delta_ids(spark, t):
    return {r.id for r in dr.read_delta(spark, t).collect()}


def _ice_ids(spark, t, **kw):
    return {r.id for r in ir.read_iceberg(spark, t, **kw).collect()}


def test_delta_to_iceberg_roundtrip_and_sync(spark, tmp_path):
    t = str(tmp_path / "d2i")
    dw.create_delta(_df(spark, 0, 10), t)
    s1 = uniform.export_iceberg_metadata(spark, t)
    assert ir.is_iceberg_table(t)
    assert _ice_ids(spark, t) == _delta_ids(spark, t) == set(range(10))
    # advance Delta, re-sync: new snapshot sees the append, the old
    # snapshot stays time-travelable at the pre-append state
    dw.append_delta(_df(spark, 10, 15), t)
    s2 = uniform.export_iceberg_metadata(spark, t)
    assert _ice_ids(spark, t) == set(range(15))
    assert _ice_ids(spark, t, snapshot_id=s1) == set(range(10))
    assert s2 != s1
    # data was never copied: every parquet sits once, in the table dir
    files = [
        f for f in glob.glob(os.path.join(t, "**/*.parquet"),
                             recursive=True)
        if "_delta_log" not in f and "/metadata/" not in f
    ]
    assert len(files) == len(dr._replay(spark, t, None)["files"])


def test_delta_cow_delete_then_sync(spark, tmp_path):
    t = str(tmp_path / "d2i-del")
    dw.create_delta(_df(spark, 0, 20).repartition(2), t)
    uniform.export_iceberg_metadata(spark, t)
    dml.delete_delta(spark, t, "id < 5")
    uniform.export_iceberg_metadata(spark, t)
    assert _ice_ids(spark, t) == set(range(5, 20))


def test_delta_to_iceberg_refusals(spark, tmp_path):
    t1 = str(tmp_path / "dv")
    dw.create_delta(_df(spark, 0, 5), t1)
    delta_dv.delete_where_dv(spark, t1, "id = 0")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        uniform.export_iceberg_metadata(spark, t1)
    t2 = str(tmp_path / "part")
    dw.create_delta(
        _df(spark, 0, 6).withColumn("g", (F.col("id") % 2).cast("int")),
        t2, partition_by=["g"],
    )
    with pytest.raises(NotImplementedError, match="partition"):
        uniform.export_iceberg_metadata(spark, t2)
    t3 = str(tmp_path / "cm")
    dw.create_delta(_df(spark, 0, 5), t3)
    dw.rename_column(spark, t3, "x", "y")
    with pytest.raises(NotImplementedError, match="column-mapped"):
        uniform.export_iceberg_metadata(spark, t3)


def test_iceberg_to_delta_roundtrip_and_sync(spark, tmp_path):
    t = str(tmp_path / "i2d")
    iw.create_iceberg(_df(spark, 0, 8), t)
    v1 = uniform.export_delta_log(spark, t)
    assert dr.is_delta_table(t)
    assert _delta_ids(spark, t) == _ice_ids(spark, t) == set(range(8))
    iw.append_iceberg(_df(spark, 8, 12), t)
    v2 = uniform.export_delta_log(spark, t)
    assert v2 == v1 + 1
    assert _delta_ids(spark, t) == set(range(12))
    # overwrite on the Iceberg side: the sync diff removes stale adds
    iw.overwrite_iceberg(_df(spark, 100, 103), t)
    uniform.export_delta_log(spark, t)
    assert _delta_ids(spark, t) == {100, 101, 102}


def test_iceberg_partitioned_to_delta(spark, tmp_path):
    """Identity-partitioned Iceberg files carry their partition
    columns, so the Delta view exposes them as plain columns."""
    t = str(tmp_path / "i2d-part")
    df = _df(spark, 0, 9).withColumn(
        "g", (F.col("id") % 3).cast("int")
    )
    iw.create_iceberg(df, t, partition_by=["g"])
    uniform.export_delta_log(spark, t)
    got = {
        (r.id, r.g) for r in dr.read_delta(spark, t).collect()
    }
    assert got == {(i, i % 3) for i in range(9)}


def test_iceberg_mor_to_delta_refuses(spark, tmp_path):
    t = str(tmp_path / "mor")
    iw.create_iceberg(_df(spark, 0, 5), t, format_version=2)
    iceberg_mor.delete_where_mor(spark, t, "id = 0")
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        uniform.export_delta_log(spark, t)


def test_noop_resync_commits_nothing(spark, tmp_path):
    t = str(tmp_path / "noop")
    iw.create_iceberg(_df(spark, 0, 3), t)
    v1 = uniform.export_delta_log(spark, t)
    assert uniform.export_delta_log(spark, t) == v1
