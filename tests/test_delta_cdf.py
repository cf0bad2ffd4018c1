"""Change Data Feed on native Delta tables: DML records change rows
(cdc actions + _change_data files) once CDF is enabled, and
read_change_feed reconstructs per-version change sets — from cdc
files, from pure appends/removals, and from deletion-vector diffs —
with loud failures where the history is not reconstructible."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_cdf as cdf
from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv as dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def _changes(spark, table, **kw):
    return {
        (r.id, r.x, r._change_type, r._commit_version)
        for r in cdf.read_change_feed(spark, table, **kw).collect()
    }


def test_appends_read_as_inserts(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 3), table)          # v0
    dw.append_delta(_df(spark, 3, 5), table)          # v1
    got = _changes(spark, table)
    assert got == {(i, i * 2.0, "insert", 0) for i in range(3)} | {
        (i, i * 2.0, "insert", 1) for i in (3, 4)
    }


def test_update_records_pre_and_postimage(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 4), table)          # v0
    cdf.enable_cdf(spark, table)                      # v1
    dml.update_delta(spark, table, "id = 2", {"x": "99.0"})   # v2
    got = _changes(spark, table, starting_version=2)
    assert got == {
        (2, 4.0, "update_preimage", 2),
        (2, 99.0, "update_postimage", 2),
    }
    # the cdc action landed in the commit, dataChange: false
    with open(os.path.join(table, "_delta_log",
                           f"{2:020d}.json")) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    cdcs = [a["cdc"] for a in acts if "cdc" in a]
    assert cdcs and all(c["dataChange"] is False for c in cdcs)
    assert all(c["path"].startswith("_change_data/") for c in cdcs)


def test_delete_records_deleted_rows(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 6).repartition(2), table)
    cdf.enable_cdf(spark, table)
    dml.delete_delta(spark, table, "id >= 4")         # v2
    got = _changes(spark, table, starting_version=2)
    assert got == {
        (4, 8.0, "delete", 2),
        (5, 10.0, "delete", 2),
    }


def test_merge_records_all_three_kinds(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 4), table)
    cdf.enable_cdf(spark, table)
    src = spark.createDataFrame(
        [(2, 50.0), (9, 90.0)], "id long, x double"
    )
    dml.merge_delta(spark, table, src, on=["id"])     # v2
    got = _changes(spark, table, starting_version=2)
    assert got == {
        (2, 4.0, "update_preimage", 2),
        (2, 50.0, "update_postimage", 2),
        (9, 90.0, "insert", 2),
    }


def test_dv_delete_changes_from_bitmap_diff(spark, tmp_path):
    """DV deletes need no cdc files: the newly deleted positions are
    the new bitmap minus the old one, and a second delete reports
    only ITS rows."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id < 2")        # v1
    dv.delete_where_dv(spark, table, "id IN (2, 3)")  # v2 (merged DV)
    got = _changes(spark, table, starting_version=1)
    assert got == {
        (0, 0.0, "delete", 1),
        (1, 2.0, "delete", 1),
        (2, 4.0, "delete", 2),
        (3, 6.0, "delete", 2),
    }


def test_pre_cdf_rewrite_raises(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 4).coalesce(1), table)
    dml.update_delta(spark, table, "id = 1", {"x": "0.0"})  # no CDF
    with pytest.raises(ValueError, match="not reconstructible"):
        cdf.read_change_feed(spark, table).collect()
    # but a range that excludes the rewrite version still reads
    got = _changes(spark, table, starting_version=0, ending_version=0)
    assert got == {(i, i * 2.0, "insert", 0) for i in range(4)}


def test_version_range_bounds(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 2), table)          # v0
    cdf.enable_cdf(spark, table)                      # v1 (no changes)
    dw.append_delta(_df(spark, 2, 3), table)          # v2
    dml.delete_delta(spark, table, "id = 0")          # v3
    got = _changes(spark, table, starting_version=2, ending_version=2)
    assert got == {(2, 4.0, "insert", 2)}
    got3 = _changes(spark, table, starting_version=3)
    assert got3 == {(0, 0.0, "delete", 3)}
    ts = {
        r._commit_timestamp
        for r in cdf.read_change_feed(spark, table, 0, 3).collect()
    }
    assert all(t is not None for t in ts)


def test_whole_file_remove_reads_as_deletes(spark, tmp_path):
    """overwrite_delta emits dataChange removes+adds in one commit —
    not reconstructible without cdc; but a DELETE that drops whole
    files (no partial rewrite) is a pure-remove commit and reads."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 4).coalesce(1), table)
    dw.append_delta(_df(spark, 4, 8).coalesce(1), table)
    dml.delete_delta(spark, table, "id >= 4")  # drops the 2nd file
    got = _changes(spark, table, starting_version=2)
    assert got == {(i, i * 2.0, "delete", 2) for i in (4, 5, 6, 7)}


def test_vacuum_leaves_change_data(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 4), table)
    cdf.enable_cdf(spark, table)
    dml.delete_delta(spark, table, "id = 0")
    removed = dw.vacuum_delta(spark, table, retain_versions=1)
    assert not any(r.startswith("_change_data/") for r in removed)
    got = _changes(spark, table, starting_version=2)
    assert got == {(0, 0.0, "delete", 2)}
