"""Iceberg PARTITION STATISTICS files (spec ``partition-statistics``):
per unique partition tuple, data/delete row+file+byte counters
computed from MANIFEST metadata alone and published as one parquet
sidecar per snapshot. Contracts: counter exactness vs a real
relational aggregate, unified-tuple nulls across spec evolution, MoR
delete attribution, registration replace, and expire_snapshots
sweeping stats of dropped snapshots.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
from dst_spark_k8_lakehouse_spark.plans import (
    iceberg_partition_stats as ips,
)
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _mk(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
    ).repartition(2)
    iw.create_iceberg(df, table, partition_by=["grp"])
    iw.append_iceberg(
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        ).repartition(1),
        table,
    )
    return table


def test_counts_match_relational_aggregate(spark, tmp_path):
    table = _mk(spark, tmp_path)
    rows = ips.compute_partition_stats(spark, table)
    by_grp = {r["partition"]["grp"]: r for r in rows}
    truth = {
        r.grp: r.n
        for r in ir.read_iceberg(spark, table)
        .groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v["data_record_count"] for k, v in by_grp.items()} == truth
    # file counts and byte totals come from the manifests; cross-check
    # against the planned file list
    plan = ir.plan_file_list(spark, table)
    assert sum(v["data_file_count"] for v in by_grp.values()) == len(
        plan["data"]
    )
    disk = sum(
        os.path.getsize(e["path"]) for e in plan["data"]
    )
    assert sum(
        v["total_data_file_size_in_bytes"] for v in by_grp.values()
    ) == disk


def test_write_read_and_replace_registration(spark, tmp_path):
    table = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no partition statistics"):
        ips.read_partition_stats(spark, table)
    e1 = ips.write_partition_stats(spark, table)
    e2 = ips.write_partition_stats(spark, table)  # same snapshot
    meta, _ = iw._load_meta(table)
    entries = meta["partition-statistics"]
    assert len(entries) == 1  # replaced, not appended
    assert entries[0]["statistics-path"] == e2["statistics-path"]
    assert e1["statistics-path"] != e2["statistics-path"]
    df = ips.read_partition_stats(spark, table)
    got = {
        r.partition.grp: r.data_record_count for r in df.collect()
    }
    truth = {
        r.grp: r.n
        for r in ir.read_iceberg(spark, table)
        .groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert got == truth


def test_unpartitioned_single_row(spark, tmp_path):
    table = str(tmp_path / "u")
    iw.create_iceberg(
        spark.range(7).select(F.col("id").alias("k")).coalesce(1),
        table,
    )
    rows = ips.compute_partition_stats(spark, table)
    assert len(rows) == 1
    assert rows[0]["data_record_count"] == 7
    ips.write_partition_stats(spark, table)
    df = ips.read_partition_stats(spark, table)
    assert "partition" not in df.columns  # no partition fields at all
    assert df.collect()[0].data_record_count == 7


def test_mor_deletes_attributed(spark, tmp_path):
    table = str(tmp_path / "m")
    df = spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
    ).repartition(1)
    iw.create_iceberg(df, table, partition_by=["grp"], format_version=2)
    iceberg_mor.delete_where_mor(spark, table, "k < 4 AND grp = 0")
    rows = ips.compute_partition_stats(spark, table)
    by_grp = {r["partition"]["grp"]: r for r in rows}
    # our MoR delete files commit under an EMPTY partition record (a
    # global delete manifest), so the stats attribute them to the
    # null tuple — exactly what the manifests say; a partition-scoped
    # delete writer would move these onto grp=0
    assert by_grp[None]["position_delete_record_count"] == 2  # k 0,2
    assert by_grp[None]["position_delete_file_count"] >= 1
    assert by_grp[0]["position_delete_record_count"] == 0
    # data counts stay PHYSICAL (pre-delete) — the spec counts file
    # contents, not net rows
    assert by_grp[0]["data_record_count"] == 6


def test_spec_evolution_unified_tuple(spark, tmp_path):
    table = str(tmp_path / "e")
    df = spark.range(8).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
    ).repartition(1)
    iw.create_iceberg(df, table, partition_by=["grp"])
    iw.add_partition_field(table, "bucket(4, k)")
    iw.append_iceberg(
        spark.range(8, 12).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        ).repartition(1),
        table,
    )
    rows = ips.compute_partition_stats(spark, table)
    names = {
        n for r in rows for n in r["partition"]
    }
    assert "grp" in names and any("bucket" in n for n in names)
    bucket_col = next(n for n in names if "bucket" in n)
    old_spec = [r for r in rows if r["spec_id"] == 0]
    new_spec = [r for r in rows if r["spec_id"] != 0]
    assert old_spec and new_spec
    # files written under the old spec carry NO value for the new
    # field in the unified tuple
    assert all(r["partition"][bucket_col] is None for r in old_spec)
    assert all(r["partition"][bucket_col] is not None for r in new_spec)


def test_expire_sweeps_stats_of_dropped_snapshots(spark, tmp_path):
    table = _mk(spark, tmp_path)
    entry = ips.write_partition_stats(spark, table)
    iw.append_iceberg(
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit(0).alias("grp")
        ).repartition(1),
        table,
    )
    iw.expire_snapshots(spark, table, retain_last=1)
    meta, _ = iw._load_meta(table)
    assert not meta.get("partition-statistics")
    assert not os.path.exists(entry["statistics-path"])
