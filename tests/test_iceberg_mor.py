"""Merge-on-read deletes on native Iceberg v2 tables: position and
equality delete files round-trip through the jar-free reader with the
spec's sequence-number semantics — a re-inserted key survives an
older equality delete, copy-on-write DML refuses to run over live
delete files, and compaction folds deletes back into plain data."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_mor as mor
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("grp"),
        (F.col("id") * 2).cast("double").alias("x"),
    )


def _ids(spark, table, **kw):
    return {r.id for r in ir.read_iceberg(spark, table, **kw).collect()}


def test_position_delete_roundtrip_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "pos")
    s1 = iw.create_iceberg(_df(spark, 0, 10), table, format_version=2)
    iw.append_iceberg(_df(spark, 10, 20), table)
    s3 = mor.delete_where_mor(spark, table, "id % 2 = 0")
    assert _ids(spark, table) == {i for i in range(20) if i % 2}
    # pre-delete snapshots still read in full
    assert _ids(spark, table, snapshot_id=s1) == set(range(10))
    snaps = ir.iceberg_snapshots(table)
    assert snaps[0]["snapshot_id"] == s3
    assert snaps[0]["operation"] == "delete"


def test_position_delete_writes_no_data_files(spark, tmp_path):
    table = str(tmp_path / "nodata")
    iw.create_iceberg(_df(spark, 0, 100), table, format_version=2)
    before = mor.mor_file_stats(spark, table)
    mor.delete_where_mor(spark, table, "id < 5")
    after = mor.mor_file_stats(spark, table)
    assert after["data_files"] == before["data_files"]
    assert after["position_delete_files"] >= 1
    assert _ids(spark, table) == set(range(5, 100))


def test_repeat_delete_is_noop(spark, tmp_path):
    table = str(tmp_path / "noop")
    iw.create_iceberg(_df(spark, 0, 10), table, format_version=2)
    s = mor.delete_where_mor(spark, table, "id < 3")
    # already-deleted rows are invisible to the second scan: no commit
    assert mor.delete_where_mor(spark, table, "id < 3") == s
    assert mor.mor_file_stats(spark, table)["position_delete_files"] == 1


def test_equality_delete_and_reinsert_survives(spark, tmp_path):
    table = str(tmp_path / "eq")
    iw.create_iceberg(_df(spark, 0, 10), table, format_version=2)
    keys = spark.createDataFrame([(3,), (7,)], "id long")
    mor.delete_keys_mor(spark, table, keys)
    assert _ids(spark, table) == set(range(10)) - {3, 7}
    # the spec's strictly-older rule: data appended AFTER the equality
    # delete has a higher sequence number and must survive it
    iw.append_iceberg(_df(spark, 7, 8), table)
    assert _ids(spark, table) == set(range(10)) - {3}


def test_equality_delete_null_safe(spark, tmp_path):
    table = str(tmp_path / "eqnull")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, tag string"
    )
    iw.create_iceberg(df, table, format_version=2)
    mor.delete_keys_mor(
        spark, table,
        spark.createDataFrame([(None,)], "tag string"),
    )
    assert _ids(spark, table) == {1, 3}


def test_cow_dml_refuses_over_live_deletes(spark, tmp_path):
    table = str(tmp_path / "refuse")
    iw.create_iceberg(_df(spark, 0, 10), table, format_version=2)
    mor.delete_where_mor(spark, table, "id = 0")
    with pytest.raises(NotImplementedError, match="compact"):
        idml.delete_iceberg(spark, table, "id = 1")
    with pytest.raises(NotImplementedError, match="compact"):
        idml.update_iceberg(spark, table, "id = 1", {"x": "0.0"})


def test_compact_folds_deletes_then_cow_works(spark, tmp_path):
    table = str(tmp_path / "compact")
    iw.create_iceberg(_df(spark, 0, 20), table, format_version=2)
    mor.delete_where_mor(spark, table, "id >= 15")
    mor.delete_keys_mor(
        spark, table, spark.createDataFrame([(0,)], "id long")
    )
    want = set(range(1, 15))
    assert _ids(spark, table) == want
    mor.compact_mor(spark, table)
    stats = mor.mor_file_stats(spark, table)
    assert stats["position_delete_files"] == 0
    assert stats["equality_delete_files"] == 0
    assert _ids(spark, table) == want
    # copy-on-write DML applies again after compaction
    idml.delete_iceberg(spark, table, "id = 1")
    assert _ids(spark, table) == want - {1}


def test_upgrade_v1_then_mor(spark, tmp_path):
    table = str(tmp_path / "upg")
    iw.create_iceberg(_df(spark, 0, 10), table)  # v1
    with pytest.raises(ValueError, match="format-version 1"):
        mor.delete_where_mor(spark, table, "id = 0")
    iw.upgrade_to_v2(table)
    mor.delete_where_mor(spark, table, "id < 4")
    assert _ids(spark, table) == set(range(4, 10))
    meta, _ = iw._load_meta(table)
    assert meta["format-version"] == 2


def test_partitioned_v2_mor_and_pruning(spark, tmp_path):
    table = str(tmp_path / "part")
    iw.create_iceberg(
        _df(spark, 0, 30), table, partition_by=["grp"], format_version=2
    )
    mor.delete_where_mor(spark, table, "id < 6")
    assert _ids(spark, table) == set(range(6, 30))
    # partition-pruned read still applies the (global) delete files
    got = _ids(spark, table, partition_filter={"grp": 0})
    assert got == {i for i in range(6, 30) if i % 3 == 0}


def test_cow_update_on_v2_keeps_sequences(spark, tmp_path):
    """A COW rewrite on a v2 table must not reset file sequences to 0:
    an equality delete committed BEFORE the rewrite may not re-apply
    to rewritten rows only if sequences say so — here the delete comes
    AFTER, so it must apply to the rewritten data (seq ordering)."""
    table = str(tmp_path / "seqcow")
    iw.create_iceberg(_df(spark, 0, 10), table, format_version=2)
    idml.update_iceberg(spark, table, "id = 2", {"x": "99.0"})
    mor.delete_keys_mor(
        spark, table, spark.createDataFrame([(2,)], "id long")
    )
    assert _ids(spark, table) == set(range(10)) - {2}


def test_v2_metadata_and_manifest_conformance(spark, tmp_path):
    table = str(tmp_path / "conform2")
    iw.create_iceberg(_df(spark, 0, 5), table, format_version=2)
    iw.append_iceberg(_df(spark, 5, 8), table)
    mor.delete_where_mor(spark, table, "id = 0")
    meta, _ = iw._load_meta(table)
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 3
    seqs = [s.get("sequence-number") for s in meta["snapshots"]]
    assert seqs == [1, 2, 3]
    # the manifest list carries v2's required fields and the append's
    # carry-forward preserved the earlier entries' content + sequences
    cur = meta["snapshots"][-1]
    rows = list(ir._avro_records(spark, cur["manifest-list"]))
    assert [int(str(r["content"])) for r in rows] == [0, 0, 1]
    assert [int(str(r["sequence_number"])) for r in rows] == [1, 2, 3]
    assert all("added_rows_count" in r for r in rows)


def test_empty_match_no_commit(spark, tmp_path):
    table = str(tmp_path / "empty")
    s = iw.create_iceberg(_df(spark, 0, 5), table, format_version=2)
    assert mor.delete_where_mor(spark, table, "id > 100") == s
    assert mor.delete_keys_mor(
        spark, table, spark.createDataFrame([], "id long")
    ) == s
    assert len(ir.iceberg_snapshots(table)) == 1


def test_delete_file_field_ids(spark, tmp_path):
    """Position-delete parquet carries the spec's reserved field ids
    — what makes it readable by a real v2 runtime."""
    import pyarrow.parquet as pq

    table = str(tmp_path / "fids")
    iw.create_iceberg(_df(spark, 0, 5), table, format_version=2)
    mor.delete_where_mor(spark, table, "id = 1")
    dels = [
        os.path.join(table, "data", f)
        for f in os.listdir(os.path.join(table, "data"))
        if f.endswith("-deletes.parquet")
    ]
    assert len(dels) == 1
    sch = pq.ParquetFile(dels[0]).schema_arrow
    ids = {
        f.name: int((f.metadata or {}).get(b"PARQUET:field_id", b"0"))
        for f in sch
    }
    assert ids == {"file_path": 2147483546, "pos": 2147483545}


def test_rewrite_position_deletes_consolidates(spark, tmp_path):
    table = str(tmp_path / "rpd")
    iw.create_iceberg(
        _df(spark, 0, 30).coalesce(2), table, format_version=2
    )
    mor.delete_where_mor(spark, table, "id < 3")
    mor.delete_where_mor(spark, table, "id >= 27")
    mor.delete_where_mor(spark, table, "id = 10")
    before = mor.mor_file_stats(spark, table)
    assert before["position_delete_files"] >= 3
    expected = _ids(spark, table)
    snap = mor.rewrite_position_delete_files(spark, table)
    after = mor.mor_file_stats(spark, table)
    assert after["position_delete_files"] == 1
    assert after["data_files"] == before["data_files"]  # data untouched
    assert _ids(spark, table) == expected
    # the consolidated file is sorted by (file_path, pos) per spec
    import pyarrow.parquet as pq

    meta, _ = iw._load_meta(table)
    s = next(
        x for x in meta["snapshots"] if x["snapshot-id"] == snap
    )
    assert s["summary"]["operation"] == "replace"
    # a later delete + read still behaves
    mor.delete_where_mor(spark, table, "id = 15")
    assert _ids(spark, table) == expected - {15}


def test_rewrite_drops_dangling_deletes(spark, tmp_path):
    table = str(tmp_path / "dang")
    iw.create_iceberg(
        _df(spark, 0, 10).coalesce(1), table, format_version=2
    )
    mor.delete_where_mor(spark, table, "id = 4")
    # plant a FOREIGN dangling delete file: positions for a data file
    # no snapshot references (what a partial rewrite leaves behind)
    meta, v = iw._load_meta(table)
    ghost = os.path.join(table, "data", "ghost-file.parquet")
    df = spark.createDataFrame(
        [(ghost, 0), (ghost, 1)], "file_path string, pos long"
    ).coalesce(1)
    files = mor._write_delete_files(
        df, table, {"file_path": mor._POS_FILE_ID,
                    "pos": mor._POS_POS_ID}
    )
    mor._delete_commit(
        spark, table, meta, v + 1, files, 1, None, "delete"
    )
    expected = _ids(spark, table)
    mor.rewrite_position_delete_files(spark, table)
    assert _ids(spark, table) == expected
    # the consolidated file carries ONLY the live target's rows
    import pyarrow.parquet as pq

    stats = mor.mor_file_stats(spark, table)
    assert stats["position_delete_files"] == 1
    meta2, _ = iw._load_meta(table)
    cur = meta2["current-snapshot-id"]
    snaps = {int(s["snapshot-id"]): s for s in meta2["snapshots"]}
    _d, pos, _e = ir._snapshot_entries(
        spark, snaps[int(cur)], iw._spec_fields(meta2)
    )
    t = pq.read_table(pos[0]["path"])
    assert t.num_rows == 1  # the ghost rows are gone
    assert "ghost" not in t.column("file_path")[0].as_py()


def test_rewrite_leaves_dv_and_equality_untouched(spark, tmp_path):
    table = str(tmp_path / "mixed")
    iw.create_iceberg(
        _df(spark, 0, 20).coalesce(1), table, format_version=2
    )
    mor.delete_where_dv(spark, table, "id = 1")
    mor.delete_keys_mor(
        spark, table, spark.createDataFrame([(2,)], "id long")
    )
    mor.delete_where_mor(spark, table, "id = 3")
    mor.delete_where_mor(spark, table, "id = 4")
    expected = _ids(spark, table)
    assert expected == set(range(20)) - {1, 2, 3, 4}
    mor.rewrite_position_delete_files(spark, table)
    assert _ids(spark, table) == expected
    stats = mor.mor_file_stats(spark, table)
    # DV blob entry still applies as a position delete (kept), the
    # two parquet pos files became one, the equality file is kept
    assert stats["equality_delete_files"] == 1
    assert stats["position_delete_files"] == 2  # 1 parquet + 1 DV


def test_rewrite_noop_without_parquet_pos_deletes(spark, tmp_path):
    table = str(tmp_path / "noop")
    iw.create_iceberg(
        _df(spark, 0, 6).coalesce(1), table, format_version=2
    )
    cur = iw._load_meta(table)[0]["current-snapshot-id"]
    assert mor.rewrite_position_delete_files(spark, table) == cur
