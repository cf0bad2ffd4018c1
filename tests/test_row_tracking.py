"""Delta ROW TRACKING (``plans/delta_rowtracking.py``): stable row
ids. Contracts: enable is one metadata+re-add commit (no data
rewrite); appends allocate non-overlapping fresh ranges from the
domain-metadata watermark; ids are unique; DV deletes keep surviving
ids BY CONSTRUCTION; OPTIMIZE preserves the full id→row mapping via
materialization; baseRowId survives BOTH checkpoint formats; rewrite
paths that would silently reassign ids refuse; the materialized
column stays hidden from ordinary reads.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_rowtracking as rt
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _mk(spark, tmp_path, n=20):
    table = str(tmp_path / "t")
    dw.create_delta(
        spark.range(n).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).repartition(3),
        table,
    )
    rt.enable_row_tracking(spark, table)
    return table


def _id_map(spark, table):
    return {
        r._row_id: r.id
        for r in dr.read_delta(spark, table, with_row_ids=True).collect()
    }


def test_enable_backfills_and_hides_mat_col(spark, tmp_path):
    table = _mk(spark, tmp_path)
    state = dr._replay(spark, table, None)
    assert rt.enabled(state)
    assert rt.high_water_mark(state) == 19
    p = state["protocol"]
    assert "rowTracking" in p["writerFeatures"]
    assert "domainMetadata" in p["writerFeatures"]
    for a in state["files"].values():
        assert a.get("baseRowId") is not None
    # plain reads do NOT show the materialized column
    df = dr.read_delta(spark, table)
    assert df.columns == ["id", "val"]
    ids = _id_map(spark, table)
    assert sorted(ids) == list(range(20))  # unique, dense backfill
    assert set(ids.values()) == set(range(20))
    # idempotent
    v = int(state["version"])
    assert rt.enable_row_tracking(spark, table) == v


def test_appends_allocate_disjoint_ranges(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.append_delta(
        spark.range(20, 30).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).coalesce(2),
        table,
    )
    dw.append_delta(
        spark.range(30, 35).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).coalesce(1),
        table,
    )
    ids = _id_map(spark, table)
    assert sorted(ids) == list(range(35))
    state = dr._replay(spark, table, None)
    assert rt.high_water_mark(state) == 34
    # defaultRowCommitVersion = the commit that added each file
    versions = {
        a["defaultRowCommitVersion"] for a in state["files"].values()
    }
    assert len(versions) == 3


def test_dv_delete_keeps_ids_stable(spark, tmp_path):
    table = _mk(spark, tmp_path)
    before = _id_map(spark, table)
    delta_dv.delete_where_dv(spark, table, "id % 4 = 0")
    after = _id_map(spark, table)
    assert after == {
        rid: v for rid, v in before.items() if v % 4 != 0
    }


def test_optimize_preserves_ids_exactly(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.append_delta(
        spark.range(20, 40).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).repartition(4),
        table,
    )
    before = _id_map(spark, table)
    v = dw.compact_delta(spark, table, target_files=1)
    assert v > 0
    after = _id_map(spark, table)
    assert after == before
    # a second round trip (append + compact again) still holds
    dw.append_delta(
        spark.range(40, 45).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).coalesce(1),
        table,
    )
    dw.compact_delta(spark, table, target_files=1)
    final = _id_map(spark, table)
    assert {k: v for k, v in final.items() if k in before} == before
    assert sorted(final.values()) == list(range(45))


@pytest.mark.parametrize("v2", [False, True])
def test_base_row_ids_survive_checkpoints(spark, tmp_path, v2):
    table = _mk(spark, tmp_path)
    before = _id_map(spark, table)
    cv = (
        dw.write_checkpoint_v2(spark, table, sidecar_files=2)
        if v2
        else dw.write_checkpoint(spark, table)
    )
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= cv:
            os.unlink(os.path.join(log, f))
    assert _id_map(spark, table) == before
    state = dr._replay(spark, table, None)
    assert rt.high_water_mark(state) == 19  # domain survived too
    dw.append_delta(
        spark.range(20, 25).select(
            "id", (F.col("id") * 10.0).alias("val")
        ).coalesce(1),
        table,
    )
    assert sorted(_id_map(spark, table)) == list(range(25))


def test_rewrite_paths_refuse(spark, tmp_path):
    table = _mk(spark, tmp_path)
    with pytest.raises(NotImplementedError, match="row-tracked"):
        dml.update_delta(spark, table, "id = 1", {"val": "0.0"})
    with pytest.raises(NotImplementedError, match="row-tracked"):
        dml.delete_delta(spark, table, "id = 1")
    with pytest.raises(NotImplementedError, match="row-tracked"):
        dw.zorder_delta(spark, table, ["id"])
    delta_dv.delete_where_dv(spark, table, "id = 1")
    with pytest.raises(NotImplementedError, match="row-tracked"):
        delta_dv.materialize_dvs(spark, table)


def test_enable_refuses_column_mapping(spark, tmp_path):
    table = str(tmp_path / "m")
    dw.create_delta(spark.range(3), table, column_mapping="name")
    with pytest.raises(NotImplementedError, match="column-mapped"):
        rt.enable_row_tracking(spark, table)


def test_compaction_through_deletion_vectors(spark, tmp_path):
    # row-tracked compaction reads through the DV subtraction: the
    # rewrite drops deleted rows for real AND keeps surviving ids
    table = _mk(spark, tmp_path, n=30)
    delta_dv.delete_where_dv(spark, table, "id >= 24")
    before = _id_map(spark, table)
    v = dw.compact_delta(spark, table, target_files=1)
    assert v > 0
    assert _id_map(spark, table) == before
    state = dr._replay(spark, table, None)
    assert not any(
        a.get("deletionVector") for a in state["files"].values()
    )  # descriptors gone — compaction doubled as materialization
    assert sorted(before.values()) == list(range(24))
