"""Deletion-vector deletes on native Delta tables: the merge-on-read
write path (``plans/delta_dv``) round-trips through the jar-free
reader AND the ``delta_native`` DataSource; bitmaps merge across
deletes, checkpoints carry descriptors, raw-file rewrites refuse to
run over live DVs, materialization folds them back, vacuum collects
expired .bin files, and inline descriptors decode."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv as dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import roaring


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("grp"),
        (F.col("id") * 2).cast("double").alias("x"),
    )


def _ids(spark, table, **kw):
    return {r.id for r in dr.read_delta(spark, table, **kw).collect()}


def _data_parquets(table):
    return sorted(
        f for f in glob.glob(os.path.join(table, "**/*.parquet"),
                             recursive=True)
        if "_delta_log" not in f
    )


def test_dv_delete_roundtrip_no_rewrite(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 100).repartition(3), table)
    before = _data_parquets(table)
    v = dv.delete_where_dv(spark, table, "id % 2 = 0")
    assert v == 1
    assert _data_parquets(table) == before  # no data file rewritten
    assert _ids(spark, table) == {i for i in range(100) if i % 2}
    # time travel: pre-delete version reads in full
    assert _ids(spark, table, version=0) == set(range(100))
    stats = dv.dv_stats(spark, table)
    assert stats["vectored_files"] >= 1
    assert stats["deleted_rows"] == 50


def test_second_delete_merges_bitmaps(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 20).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id < 5")
    dv.delete_where_dv(spark, table, "id >= 15")
    assert _ids(spark, table) == set(range(5, 15))
    stats = dv.dv_stats(spark, table)
    assert stats["vectored_files"] == 1  # one file, one merged DV
    assert stats["deleted_rows"] == 10
    # re-deleting already-invisible rows is a no-op (no commit)
    assert dv.delete_where_dv(spark, table, "id < 5") == -1


def test_protocol_upgrade_written_once(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10), table)
    dv.delete_where_dv(spark, table, "id = 0")
    state = dr._replay(spark, table, None)
    p = state["protocol"]
    assert p["minReaderVersion"] == 3
    assert p["minWriterVersion"] == 7
    assert "deletionVectors" in p["readerFeatures"]
    # second DV commit does not re-emit protocol
    dv.delete_where_dv(spark, table, "id = 1")
    with open(os.path.join(table, "_delta_log",
                           f"{2:020d}.json")) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    assert not any("protocol" in a for a in acts)


def test_partitioned_dv_and_pruned_read(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 30), table, partition_by=["grp"])
    dv.delete_where_dv(spark, table, "id < 6")
    assert _ids(spark, table) == set(range(6, 30))
    got = _ids(spark, table, partition_filter={"grp": "0"})
    assert got == {i for i in range(6, 30) if i % 3 == 0}


def test_raw_rewrites_refuse_over_dvs(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10), table)
    dv.delete_where_dv(spark, table, "id = 3")
    with pytest.raises(NotImplementedError, match="materialize"):
        dml.delete_delta(spark, table, "id = 4")
    with pytest.raises(NotImplementedError, match="materialize"):
        dml.update_delta(spark, table, "id = 4", {"x": "0.0"})
    with pytest.raises(NotImplementedError, match="materialize"):
        dw.compact_delta(spark, table, target_files=1, min_files=1)


def test_materialize_then_cow_and_vacuum(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 40).repartition(2), table)
    dv.delete_where_dv(spark, table, "id >= 30")
    want = set(range(30))
    assert dv.materialize_dvs(spark, table) == 2
    assert _ids(spark, table) == want
    assert dv.dv_stats(spark, table)["vectored_files"] == 0
    # re-materializing is a no-op
    assert dv.materialize_dvs(spark, table) == -1
    # copy-on-write DML applies again
    dml.delete_delta(spark, table, "id = 0")
    assert _ids(spark, table) == want - {0}
    # the .bin is only referenced by expired versions now: vacuum
    bins = glob.glob(os.path.join(table, "deletion_vector_*.bin"))
    assert len(bins) == 1
    removed = dw.vacuum_delta(spark, table, retain_versions=1)
    assert any(r.endswith(".bin") for r in removed)
    assert not glob.glob(os.path.join(table, "deletion_vector_*.bin"))
    assert _ids(spark, table) == want - {0}


def test_vacuum_keeps_referenced_bin(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10), table)
    dv.delete_where_dv(spark, table, "id = 1")
    removed = dw.vacuum_delta(spark, table, retain_versions=1)
    assert not any(r.endswith(".bin") for r in removed)
    assert _ids(spark, table) == set(range(10)) - {1}


def test_checkpoint_preserves_dvs_and_protocol(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 20).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id < 8")
    dw.write_checkpoint(spark, table)
    # delete the JSON commits the checkpoint covers: replay must come
    # entirely from checkpoint state
    for v in (0, 1):
        os.unlink(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    assert _ids(spark, table) == set(range(8, 20))
    state = dr._replay(spark, table, None)
    assert "deletionVectors" in state["protocol"]["readerFeatures"]
    # and further DV deletes on checkpoint-replayed state still merge
    dv.delete_where_dv(spark, table, "id = 8")
    assert _ids(spark, table) == set(range(9, 20))


def test_datasource_batch_applies_dvs(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 25), table)
    dv.delete_where_dv(spark, table, "id % 5 = 0")
    got = {
        r.id
        for r in spark.read.format("delta_native").load(table).collect()
    }
    assert got == {i for i in range(25) if i % 5}


def test_inline_descriptor_reads(spark, tmp_path):
    """Real engines may inline small DVs into the log (storageType
    'i', Z85 text) — hand-edit the committed descriptor into inline
    form and verify the read path decodes it."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 12).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id IN (2, 3)")
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    for a in acts:
        if "add" in a and a["add"].get("deletionVector"):
            d = a["add"]["deletionVector"]
            data = roaring.read_dv_blob(
                dv.dv_file_path(table, d), d["offset"], d["sizeInBytes"]
            )
            pad = (-len(data)) % 4
            a["add"]["deletionVector"] = {
                "storageType": "i",
                "pathOrInlineDv": roaring.z85_encode(
                    data + b"\x00" * pad
                ),
                "sizeInBytes": len(data),
                "cardinality": d["cardinality"],
            }
    with open(log, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    assert _ids(spark, table) == set(range(12)) - {2, 3}


def test_cardinality_mismatch_raises(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id = 7")
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    for a in acts:
        if "add" in a and a["add"].get("deletionVector"):
            a["add"]["deletionVector"]["cardinality"] = 99
    with open(log, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="cardinality"):
        dr.read_delta(spark, table).collect()


def test_dv_on_renamed_column_table(spark, tmp_path):
    """delete_where_dv evaluates its predicate through read_delta, so
    column-mapping ('name' mode after RENAME) resolves."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 10), table)
    dw.rename_column(spark, table, "x", "y")
    dv.delete_where_dv(spark, table, "y > 10")
    got = {
        (r.id, r.y) for r in dr.read_delta(spark, table).collect()
    }
    assert got == {(i, float(i * 2)) for i in range(6)}


def test_dv_blob_bytes_match_reference_serialization(spark, tmp_path):
    """The executor-side bitmap build must produce byte-identical DVs
    to a driver-side ``serialize_rbm_array(sorted(positions))`` — the
    contract that kept the r6→r7 path change invisible on disk."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 1000).coalesce(1), table)
    dv.delete_where_dv(spark, table, "id % 7 = 0")
    state = dr._replay(spark, table, None)
    [(rel, add)] = list(state["files"].items())
    d = add["deletionVector"]
    got = roaring.read_dv_blob(
        dv.dv_file_path(table, d), int(d["offset"]), int(d["sizeInBytes"])
    )
    # positions are file-ordinal row indexes; one file → id order
    want_positions = sorted(i for i in range(1000) if i % 7 == 0)
    assert got == roaring.serialize_rbm_array(want_positions)
    assert int(d["cardinality"]) == len(want_positions)
    # second delete merges EXECUTOR-side and stays byte-deterministic
    dv.delete_where_dv(spark, table, "id % 11 = 0")
    state = dr._replay(spark, table, None)
    [(rel, add)] = list(state["files"].items())
    d = add["deletionVector"]
    got = roaring.read_dv_blob(
        dv.dv_file_path(table, d), int(d["offset"]), int(d["sizeInBytes"])
    )
    want_positions = sorted(
        i for i in range(1000) if i % 7 == 0 or i % 11 == 0
    )
    assert got == roaring.serialize_rbm_array(want_positions)


def test_wide_delete_bounded_driver(spark, tmp_path):
    """The delete-10%-of-a-big-table shape (VERDICT r6 item 2): ≥10⁶
    matched rows across many files must commit with the driver
    receiving only compressed blobs (KB per file), and read back
    correctly. Before the executor-side build this was a
    driver-collect of every matched position."""
    table = str(tmp_path / "t")
    n = 2_000_000
    dw.create_delta(_df(spark, 0, n).repartition(8), table)
    v = dv.delete_where_dv(spark, table, "id % 2 = 0")  # 10⁶ matches
    assert v == 1
    stats = dv.dv_stats(spark, table)
    assert stats["deleted_rows"] == n // 2
    assert stats["vectored_files"] == len(_data_parquets(table))
    # the driver-side artifact is small: one .bin, far below the
    # 8 MB a raw int64 position gather would have been
    bins = glob.glob(os.path.join(table, "deletion_vector_*.bin"))
    assert len(bins) == 1
    assert os.path.getsize(bins[0]) < 2_000_000
    got = dr.read_delta(spark, table)
    assert got.count() == n // 2
    assert got.where("id % 2 = 0").count() == 0
