"""Delta SHALLOW CLONE (r10): zero-copy table fork by absolute-path
add actions — independence in both directions, DML containment (the
clone's copy-on-write never touches source files), vacuum rooted at
the clone, carried stats, time-travel clones, and the refusal set."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import (
    delta_dv,
    delta_reader as dr,
    delta_writer as dw,
    dml,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    )


def _ids(spark, t, **kw):
    return {r.id for r in dr.read_delta(spark, t, **kw).collect()}


def _parquets(d):
    out = set()
    for root, _dirs, fs in os.walk(d):
        if "_delta_log" in root:
            continue
        out |= {os.path.join(root, f) for f in fs if f.endswith(".parquet")}
    return out


def test_clone_reads_equal_and_independent(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(_rows(spark, 0, 100), src)
    dw.shallow_clone_delta(spark, src, dst)
    # zero data movement: the clone dir holds no parquet at all
    assert _parquets(dst) == set()
    assert _ids(spark, dst) == set(range(100))
    # src moves on → clone frozen; clone moves on → src frozen
    dw.append_delta(_rows(spark, 100, 120), src)
    dw.append_delta(_rows(spark, 200, 210), dst)
    assert _ids(spark, src) == set(range(120))
    assert _ids(spark, dst) == set(range(100)) | set(range(200, 210))
    # the clone's own append is a RELATIVE file in its dir
    assert len(_parquets(dst)) > 0


def test_clone_dml_contained_and_vacuum_safe(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(_rows(spark, 0, 100), src)
    src_files_before = _parquets(src)
    dw.shallow_clone_delta(spark, src, dst)
    tables = {"src": src, "dst": dst}
    dml.execute_native_sql(spark, "DELETE FROM dst WHERE g = 2", tables)
    assert _ids(spark, dst) == {i for i in range(100) if i % 5 != 2}
    assert _ids(spark, src) == set(range(100))  # source untouched
    assert _parquets(src) == src_files_before  # byte-level untouched
    # vacuum on the clone: only clone-root files are candidates —
    # shared source files survive even though the clone tombstoned
    # every one of them (the DELETE rewrote all files it kept)
    dw.vacuum_delta(spark, dst, retain_versions=1)
    assert _parquets(src) == src_files_before
    assert _ids(spark, src) == set(range(100))
    assert _ids(spark, dst) == {i for i in range(100) if i % 5 != 2}


def test_clone_version_as_of_and_statement_text(spark, tmp_path):
    src = str(tmp_path / "src")
    dw.create_delta(_rows(spark, 0, 50), src)
    dw.append_delta(_rows(spark, 50, 80), src)
    tables = {
        "src": src,
        "c0": str(tmp_path / "c0"),
        "c1": str(tmp_path / "c1"),
    }
    dml.execute_native_sql(
        spark, "CREATE TABLE c0 SHALLOW CLONE src VERSION AS OF 0",
        tables,
    )
    dml.execute_native_sql(
        spark, "CREATE TABLE c1 SHALLOW CLONE src", tables
    )
    assert _ids(spark, tables["c0"]) == set(range(50))
    assert _ids(spark, tables["c1"]) == set(range(80))
    with pytest.raises(ValueError, match="already exists"):
        dw.shallow_clone_delta(spark, src, tables["c1"])


def test_clone_carries_stats_for_skipping(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    clustered = (
        spark.range(4000)
        .select(F.col("id"), (F.col("id") % 7).alias("g"))
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    dw.create_delta(clustered, src)
    dw.shallow_clone_delta(spark, src, dst)
    got = dr.read_delta(spark, dst, predicates=[("id", "<", 100)])
    assert got.count() == 100
    # the carried per-add stats prune the absolute-path scan
    assert len(set(got.inputFiles())) <= 2


def test_clone_partitioned_source(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(
        _rows(spark, 0, 200), src, partition_by=["g"]
    )
    dw.shallow_clone_delta(spark, src, dst)
    assert _ids(spark, dst) == set(range(200))
    got = dr.read_delta(spark, dst, partition_filter={"g": "3"})
    assert {r.id for r in got.collect()} == {
        i for i in range(200) if i % 5 == 3
    }


def test_clone_refusals(spark, tmp_path):
    src = str(tmp_path / "src")
    dw.create_delta(_rows(spark, 0, 50), src)
    delta_dv.delete_where_dv(spark, src, "id < 5")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        dw.shallow_clone_delta(spark, src, str(tmp_path / "d1"))
    # materialized DVs clone fine
    delta_dv.materialize_dvs(spark, src)
    dw.shallow_clone_delta(spark, src, str(tmp_path / "d2"))
    assert _ids(spark, str(tmp_path / "d2")) == set(range(5, 50))
    # Iceberg source through the statement face: named refusal
    from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw

    ice = str(tmp_path / "ice")
    iw.create_iceberg(_rows(spark, 0, 10), ice)
    with pytest.raises(NotImplementedError, match="SHALLOW CLONE"):
        dml.execute_native_sql(
            spark, "CREATE TABLE d3 SHALLOW CLONE ice",
            {"ice": ice, "d3": str(tmp_path / "d3")},
        )


def test_clone_compaction_and_zorder(spark, tmp_path):
    """Maintenance on a clone: OPTIMIZE bin-pack and ZORDER read the
    shared absolute files and write their outputs as the clone's OWN
    relative files; the source stays byte-identical throughout."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(_rows(spark, 0, 2000).repartition(8), src)
    before = _parquets(src)
    dw.shallow_clone_delta(spark, src, dst)
    v = dw.compact_delta(spark, dst, min_files=2)
    assert v > 0
    assert _ids(spark, dst) == set(range(2000))
    assert _parquets(src) == before
    assert len(_parquets(dst)) >= 1  # compacted output is clone-local
    dw.zorder_delta(spark, dst, ["id"])
    got = dr.read_delta(spark, dst, predicates=[("id", "<", 100)])
    assert got.count() == 100
    assert _parquets(src) == before
    assert _ids(spark, src) == set(range(2000))


def test_partitioned_clone_reads_as_one_scan(spark, tmp_path):
    """The clone of a partitioned source anchors the single basePath
    scan at the SOURCE's hive root — not the per-partition-group
    union, whose plan grows with partition count (fatal on a clone of
    a 100k-partition table)."""
    import io
    from contextlib import redirect_stdout

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(_rows(spark, 0, 500), src, partition_by=["g"])
    dw.shallow_clone_delta(spark, src, dst)
    df = dr.read_delta(spark, dst)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan
    assert _ids(spark, dst) == set(range(500))
    # mixed lineage (clone-local append) falls back to the exact path
    dw.append_delta(_rows(spark, 500, 520), dst)
    assert _ids(spark, dst) == set(range(520))


def test_clone_of_column_mapped_source(spark, tmp_path):
    """Cloning a column-mapping table carries the mapping metadata
    (physicalName/id live in the schemaString) — renames on the clone
    stay metadata-only and never touch shared files."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    dw.create_delta(_rows(spark, 0, 60), src, column_mapping="name")
    dw.rename_column(spark, src, "g", "grp")
    before = _parquets(src)
    dw.shallow_clone_delta(spark, src, dst)
    got = dr.read_delta(spark, dst)
    assert set(got.columns) == {"id", "grp"}
    assert _ids(spark, dst) == set(range(60))
    dw.rename_column(spark, dst, "grp", "bucket_no")
    assert set(dr.read_delta(spark, dst).columns) == {"id", "bucket_no"}
    assert set(dr.read_delta(spark, src).columns) == {"id", "grp"}
    assert _parquets(src) == before
