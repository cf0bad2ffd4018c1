"""In-place migration of plain parquet directories into native Delta
/ Iceberg tables (CONVERT TO DELTA / Iceberg migrate — metadata-only,
zero data movement), plus Iceberg timestamp travel and named refs
(tags/branches)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.plans import convert
from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _plain_dir(spark, path, partitioned=False):
    df = spark.range(20).select(
        "id", (F.col("id") % 2).cast("int").alias("g"),
        (F.col("id") * 2.0).alias("x"),
    )
    w = df.write
    if partitioned:
        w = w.partitionBy("g")
    w.parquet(path)
    return df


def test_convert_to_delta_then_full_surface(spark, tmp_path):
    path = str(tmp_path / "plain")
    _plain_dir(spark, path)
    assert convert.convert_to_delta(spark, path) == 0
    assert dr.is_delta_table(path)
    assert {r.id for r in dr.read_delta(spark, path).collect()} \
        == set(range(20))
    # the converted table takes native DML immediately
    dml.delete_delta(spark, path, "id < 5")
    assert {r.id for r in dr.read_delta(spark, path).collect()} \
        == set(range(5, 20))
    with pytest.raises(ValueError, match="already a Delta table"):
        convert.convert_to_delta(spark, path)


def test_convert_partitioned_hive_dir(spark, tmp_path):
    path = str(tmp_path / "hive")
    _plain_dir(spark, path, partitioned=True)
    convert.convert_to_delta(
        spark, path, partition_cols={"g": T.IntegerType()}
    )
    got = {(r.id, r.g) for r in dr.read_delta(spark, path).collect()}
    assert got == {(i, i % 2) for i in range(20)}
    # the declared partition column prunes through the file list
    only0 = dr.read_delta(spark, path, partition_filter={"g": "0"})
    assert {r.id for r in only0.collect()} \
        == {i for i in range(20) if i % 2 == 0}


def test_convert_partitioned_requires_declaration(spark, tmp_path):
    path = str(tmp_path / "hive2")
    _plain_dir(spark, path, partitioned=True)
    convert.convert_to_delta(spark, path)  # no partition_cols
    # without the declaration the hive dirs are opaque: files read as
    # data-only (g absent) — the reader sees the DATA columns only
    cols = dr.read_delta(spark, path).columns
    assert "g" not in cols


def test_convert_to_iceberg_then_dml(spark, tmp_path):
    path = str(tmp_path / "plainib")
    _plain_dir(spark, path)
    convert.convert_to_iceberg(spark, path)
    assert ir.is_iceberg_table(path)
    assert {r.id for r in ir.read_iceberg(spark, path).collect()} \
        == set(range(20))
    idml.delete_iceberg(spark, path, "id >= 15")
    assert {r.id for r in ir.read_iceberg(spark, path).collect()} \
        == set(range(15))
    with pytest.raises(ValueError, match="already an Iceberg"):
        convert.convert_to_iceberg(spark, path)


def test_convert_to_iceberg_refuses_nested_layout(spark, tmp_path):
    path = str(tmp_path / "hive3")
    _plain_dir(spark, path, partitioned=True)
    with pytest.raises(NotImplementedError, match="layout"):
        convert.convert_to_iceberg(spark, path)


def test_iceberg_timestamp_travel(spark, tmp_path):
    t = str(tmp_path / "ts")
    iw.create_iceberg(spark.range(3), t)
    time.sleep(0.05)
    mid = int(time.time() * 1000)
    time.sleep(0.05)
    iw.append_iceberg(spark.range(3, 6), t)
    assert {r.id for r in ir.read_iceberg(
        spark, t, timestamp_ms=mid
    ).collect()} == {0, 1, 2}
    assert {r.id for r in ir.read_iceberg(
        spark, t, timestamp_ms=int(time.time() * 1000) + 1000
    ).collect()} == set(range(6))
    with pytest.raises(ValueError, match="no snapshot"):
        ir.read_iceberg(spark, t, timestamp_ms=1)


def test_iceberg_tags_and_branches(spark, tmp_path):
    t = str(tmp_path / "refs")
    s1 = iw.create_iceberg(spark.range(4), t)
    iw.create_tag(t, "v1.0")  # tags the current snapshot
    iw.append_iceberg(spark.range(4, 8), t)
    assert {r.id for r in ir.read_iceberg(spark, t, ref="v1.0")
            .collect()} == set(range(4))
    # tags are immutable; branches can be repointed
    with pytest.raises(ValueError, match="immutable"):
        iw.create_tag(t, "v1.0")
    iw.create_tag(t, "dev", ref_type="branch")
    iw.create_tag(t, "dev", snapshot_id=s1, ref_type="branch")
    assert {r.id for r in ir.read_iceberg(spark, t, ref="dev")
            .collect()} == set(range(4))
    iw.drop_ref(t, "dev")
    with pytest.raises(ValueError, match="not in table"):
        ir.read_iceberg(spark, t, ref="dev")
    with pytest.raises(ValueError, match="at most one"):
        ir.read_iceberg(spark, t, snapshot_id=s1, ref="v1.0")
