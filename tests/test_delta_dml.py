"""Row-level DML on native Delta logs (jar-free copy-on-write) and
the classic parquet checkpoint writer, verified through the log
reader: value correctness, file-granular rewrite (untouched files'
add actions survive), bare-remove deletes, time travel across DML,
and checkpoint supersession of the JSON commits."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _mk(spark, tmp_path, name="t", parts=4, n=20):
    table = str(tmp_path / name)
    df = (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id"),
            (F.col("id") % 5).alias("grp"),
            (F.col("id") * 10).cast("double").alias("val"),
        )
    )
    dw.create_delta(df, table)
    return table


def _log_actions(table, version):
    with open(os.path.join(table, "_delta_log", f"{version:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def test_update_values_and_untouched_rows(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v = dml.update_delta(
        spark, table, "grp = 2", {"val": "val + 1000"}
    )
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got[2] == 1020.0 and got[7] == 1070.0  # grp=2 rows bumped
    assert got[0] == 0.0 and got[19] == 190.0  # others untouched
    assert v == 1
    # time travel still shows the pre-update values
    old = {r.id: r.val for r in dr.read_delta(spark, table, version=0).collect()}
    assert old[2] == 20.0


def test_update_rewrites_only_touched_files(spark, tmp_path):
    table = _mk(spark, tmp_path)
    before = set(dr._replay(spark, table, None)["files"])
    dml.update_delta(spark, table, "id = 3", {"val": "-1.0"})
    actions = _log_actions(table, 1)
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    assert removed, "the file containing id=3 must be rewritten"
    assert removed < before, "only a strict subset of files rewritten"
    after = set(dr._replay(spark, table, None)["files"])
    assert (before - removed) <= after, "untouched add actions survive"


def test_update_noop_commits_nothing(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v = dml.update_delta(spark, table, "id = 999", {"val": "0.0"})
    assert v == 0  # still at the create version; no empty commit
    assert len(dr._commit_files(table)) == 1


def test_update_partition_column_refused(spark, tmp_path):
    table = str(tmp_path / "p")
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    # hand-build a partitioned table: one file per grp partition value
    sub = spark.range(4).select(F.col("id"), F.lit(7.0).alias("val"))
    adds = dw._write_data_files(sub, table)
    for a in adds:
        a["add"]["partitionValues"] = {"grp": "1"}
    schema_str = dw._schema_string(
        spark.range(1)
        .select("id", F.lit(7.0).alias("val"), F.lit(1).alias("grp"))
        .schema
    )
    dw._commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": ["grp"],
                    "configuration": {},
                }
            },
            *adds,
            dw._commit_info("CREATE"),
        ],
    )
    with pytest.raises(NotImplementedError, match="partition column"):
        dml.update_delta(spark, table, "id = 1", {"grp": "2"})
    # but updating a data column on the partitioned table works,
    # keeps the partitionValues, and the injected literal is readable
    dml.update_delta(spark, table, "id = 1", {"val": "9.0"})
    rows = {r.id: (r.val, r.grp) for r in dr.read_delta(spark, table).collect()}
    assert rows[1] == (9.0, 1) and rows[0] == (7.0, 1)


def test_delete_partial_and_full_files(spark, tmp_path):
    table = _mk(spark, tmp_path, parts=2, n=10)
    # delete everything in one of the two files -> bare remove, no add
    state = dr._replay(spark, table, None)
    first_file = sorted(state["files"])[0]
    df = spark.read.parquet(os.path.join(table, first_file))
    ids = [r.id for r in df.collect()]
    dml.delete_delta(
        spark, table, f"id IN ({','.join(str(i) for i in ids)})"
    )
    actions = _log_actions(table, 1)
    assert any("remove" in a for a in actions)
    assert not any("add" in a for a in actions), (
        "a fully-matching file is dropped without rewriting anything"
    )
    remaining = {r.id for r in dr.read_delta(spark, table).collect()}
    assert remaining == set(range(10)) - set(ids)
    # now a partial delete rewrites the survivor file
    victim = sorted(remaining)[0]
    dml.delete_delta(spark, table, f"id = {victim}")
    actions = _log_actions(table, 2)
    assert any("remove" in a for a in actions)
    assert any("add" in a for a in actions)
    assert {r.id for r in dr.read_delta(spark, table).collect()} == (
        remaining - {victim}
    )


def test_delete_null_condition_keeps_row(spark, tmp_path):
    table = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 50.0)], "id long, val double"
    )
    dw.create_delta(df, table)
    dml.delete_delta(spark, table, "val > 10")
    got = {r.id for r in dr.read_delta(spark, table).collect()}
    assert got == {1, 2}, "NULL-predicate rows survive a DELETE"


def test_merge_upsert_matches_versioned_semantics(spark, tmp_path):
    table = _mk(spark, tmp_path, parts=3, n=8)
    source = spark.createDataFrame(
        [(2, 99, -2.0), (100, 0, -100.0)], "id long, grp long, val double"
    )
    dml.merge_delta(spark, table, source, on=["id"])
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got[2] == -2.0, "matched row replaced"
    assert got[100] == -100.0, "unmatched source row inserted"
    assert got[5] == 50.0 and len(got) == 9


def test_merge_variants_and_duplicate_source(spark, tmp_path):
    table = _mk(spark, tmp_path, n=4)
    src = spark.createDataFrame(
        [(1, 0, -1.0), (9, 0, -9.0)], "id long, grp long, val double"
    )
    dml.merge_delta(
        spark, table, src, on=["id"], insert_when_not_matched=False
    )
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got[1] == -1.0 and 9 not in got
    dml.merge_delta(
        spark, table, src, on=["id"], update_when_matched=False
    )
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got[1] == -1.0 and got[9] == -9.0  # insert-only left 1 alone
    dup = spark.createDataFrame(
        [(1, 0, 0.0), (1, 0, 1.0)], "id long, grp long, val double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        dml.merge_delta(spark, table, dup, on=["id"])


def test_merge_into_empty_table(spark, tmp_path):
    table = str(tmp_path / "empty")
    df = spark.createDataFrame([], "id long, val double")
    dw.create_delta(df, table)
    src = spark.createDataFrame([(1, 1.0)], "id long, val double")
    dml.merge_delta(spark, table, src, on=["id"])
    assert dr.read_delta(spark, table).count() == 1


def test_checkpoint_supersedes_json_commits(spark, tmp_path):
    table = _mk(spark, tmp_path, parts=2, n=6)
    dml.update_delta(spark, table, "id = 0", {"val": "111.0"})
    dml.delete_delta(spark, table, "id = 5")
    v = dw.write_checkpoint(spark, table)
    assert v == 2
    expect = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    # drop every JSON commit <= checkpoint: reader must still resolve
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got == expect
    assert got[0] == 111.0 and 5 not in got
    # and writes continue past the checkpoint
    dw.append_delta(
        spark.createDataFrame([(50, 3, 5.0)], "id long, grp long, val double"),
        table,
    )
    assert dr.read_delta(spark, table).count() == len(expect) + 1


def test_checkpoint_carries_protocol_and_dml_after(spark, tmp_path):
    table = _mk(spark, tmp_path, n=4)
    v = dw.write_checkpoint(spark, table)
    cp = spark.read.parquet(
        os.path.join(table, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    rows = cp.collect()
    protos = [r.protocol for r in rows if r.protocol is not None]
    metas = [r.metaData for r in rows if r.metaData is not None]
    assert len(protos) == 1 and protos[0].minReaderVersion == 1
    assert len(metas) == 1 and "fields" in metas[0].schemaString
    adds = [r.add for r in rows if r.add is not None]
    assert adds and all(a.dataChange is False for a in adds)
    # DML on top of a checkpointed table still works end-to-end
    dml.update_delta(spark, table, "id = 1", {"val": "42.0"})
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got[1] == 42.0
