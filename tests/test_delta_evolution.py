"""Schema evolution, partitioned writes, partition-pruned reads and
optimistic-commit retries on NATIVE (jar-free) Delta logs — the
reference's actual write patterns: mergeSchema appends
(``modules/dst_metrics/spark_logger.py:55-57``,
``03_delta_demo.ipynb:163``), partitioned tables
(``02_iceberg_demo.ipynb:45-54``) and ALTER TABLE ADD/RENAME COLUMN
(``02_iceberg_demo.ipynb:122-123``)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def _data_files(table):
    out = []
    for root, dirs, fs in os.walk(table):
        dirs[:] = [d for d in dirs if d != "_delta_log"
                   and not d.startswith("_staging")]
        out += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
    return out


# ---------------------------------------------------------------- schema

def test_merge_schema_append_widens(spark, tmp_path):
    table = str(tmp_path / "ms")
    dw.create_delta(
        spark.range(3).select("id", (F.col("id") * 2).alias("x")), table
    )
    with pytest.raises(ValueError, match="merge_schema"):
        dw.append_delta(
            spark.range(3, 5).select(
                "id", (F.col("id") * 2).alias("x"), F.lit("n").alias("tag")
            ),
            table,
        )
    dw.append_delta(
        spark.range(3, 5).select(
            "id", (F.col("id") * 2).alias("x"), F.lit("n").alias("tag")
        ),
        table,
        merge_schema=True,
    )
    cur = dr.read_delta(spark, table)
    assert cur.columns == ["id", "x", "tag"]
    rows = {r.id: r.tag for r in cur.collect()}
    assert rows[0] is None and rows[4] == "n"
    # the pre-evolution version still reads with the narrow schema
    v0 = dr.read_delta(spark, table, version=0)
    assert v0.columns == ["id", "x"]
    assert _ids(v0) == {0, 1, 2}


def test_merge_schema_refuses_type_change(spark, tmp_path):
    table = str(tmp_path / "tc")
    dw.create_delta(spark.range(2).select("id", F.lit(1).alias("x")), table)
    with pytest.raises(ValueError, match="type"):
        dw.append_delta(
            spark.range(2).select("id", F.lit("s").alias("x")),
            table,
            merge_schema=True,
        )


def test_append_null_fills_missing_nullable_column(spark, tmp_path):
    table = str(tmp_path / "nf")
    dw.create_delta(
        # when() without otherwise() keeps the column nullable (a bare
        # lit() is non-nullable, and non-nullable columns must refuse)
        spark.range(2).select(
            "id", F.when(F.col("id") >= 0, F.lit("a")).alias("tag")
        ),
        table,
    )
    dw.append_delta(spark.range(2, 4).select("id"), table)
    rows = {r.id: r.tag for r in dr.read_delta(spark, table).collect()}
    assert rows == {0: "a", 1: "a", 2: None, 3: None}


def test_add_column_is_metadata_only(spark, tmp_path):
    table = str(tmp_path / "ac")
    dw.create_delta(spark.range(3), table)
    before = set(_data_files(table))
    v = dw.add_column(spark, table, "note", "string")
    assert set(_data_files(table)) == before  # no data job
    cur = dr.read_delta(spark, table)
    assert cur.columns == ["id", "note"]
    assert [r.note for r in cur.collect()] == [None] * 3
    assert dr.read_delta(spark, table, version=v - 1).columns == ["id"]
    with pytest.raises(ValueError, match="already exists"):
        dw.add_column(spark, table, "note", "string")


def test_rename_column_via_column_mapping(spark, tmp_path):
    table = str(tmp_path / "rn")
    dw.create_delta(
        spark.range(3).select("id", (F.col("id") * 10).alias("x")), table
    )
    before = set(_data_files(table))
    dw.rename_column(spark, table, "x", "renamed_x")
    assert set(_data_files(table)) == before  # metadata-only
    cur = dr.read_delta(spark, table)
    assert cur.columns == ["id", "renamed_x"]
    assert {r.renamed_x for r in cur.collect()} == {0, 10, 20}
    # old version still shows the old name
    assert dr.read_delta(spark, table, version=0).columns == ["id", "x"]
    # the log now declares column mapping + upgraded protocol
    state = dr._replay(spark, table, None)
    conf = state["metaData"]["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    fields = json.loads(state["metaData"]["schemaString"])["fields"]
    byname = {f["name"]: f for f in fields}
    assert (
        byname["renamed_x"]["metadata"]["delta.columnMapping.physicalName"]
        == "x"
    )
    assert state["protocol"]["minReaderVersion"] == 2
    # appends after the rename write PHYSICAL names and read back
    dw.append_delta(
        spark.range(3, 5).select("id", (F.col("id") * 10).alias("renamed_x")),
        table,
    )
    assert {r.renamed_x for r in dr.read_delta(spark, table).collect()} == {
        0, 10, 20, 30, 40,
    }
    # merge-schema evolution composes with mapping
    dw.append_delta(
        spark.range(5, 6).select(
            "id", F.lit(99).cast("long").alias("renamed_x"),
            F.lit("t").alias("tag"),
        ),
        table,
        merge_schema=True,
    )
    got = {r.id: (r.renamed_x, r.tag)
           for r in dr.read_delta(spark, table).collect()}
    assert got[5] == (99, "t") and got[0] == (0, None)
    # row-level DML refuses mapped tables loudly (never wrong rows)
    with pytest.raises(NotImplementedError, match="column-mapped"):
        dml.delete_delta(spark, table, "id = 1")


def test_reader_raises_on_malformed_id_mapping(spark, tmp_path):
    """id mode is READ now (test_delta_id_mapping.py) — but a table
    declaring it whose schema carries no delta.columnMapping.id must
    raise, not guess."""
    table = str(tmp_path / "idm")
    dw.create_delta(spark.range(2), table)
    state = dr._replay(spark, table, None)
    meta = dict(state["metaData"])
    meta["configuration"] = {"delta.columnMapping.mode": "id"}
    dw._commit(table, 1, [{"metaData": meta}, dw._commit_info("SET")])
    with pytest.raises(ValueError, match="delta.columnMapping.id"):
        dr.read_delta(spark, table)


# ---------------------------------------------------------- partitioning

def test_partitioned_create_hive_layout_and_single_scan(spark, tmp_path):
    table = str(tmp_path / "pt")
    df = spark.range(100).select(
        "id", (F.col("id") % 4).cast("int").alias("bucket")
    )
    dw.create_delta(df, table, partition_by=["bucket"])
    state = dr._replay(spark, table, None)
    assert state["metaData"]["partitionColumns"] == ["bucket"]
    for rel, a in state["files"].items():
        assert rel.startswith("bucket="), rel
        assert a["partitionValues"] == {"bucket": rel.split("=")[1].split("/")[0]}
    cur = dr.read_delta(spark, table)
    assert cur.count() == 100
    assert cur.schema["bucket"].dataType.simpleString() == "int"
    got = {(r.id, r.bucket) for r in cur.collect()}
    assert got == {(i, i % 4) for i in range(100)}
    # ONE scan (no per-partition union) and partition predicates prune it
    plan = cur.where("bucket = 2")._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "PartitionFilters" in plan and "bucket" in plan


def test_partition_filter_prunes_file_list(spark, tmp_path):
    table = str(tmp_path / "pf")
    df = spark.range(40).select(
        "id", (F.col("id") % 4).cast("int").alias("bucket")
    )
    dw.create_delta(df, table, partition_by=["bucket"])
    pruned = dr.read_delta(spark, table, partition_filter={"bucket": 1})
    files = pruned.inputFiles()
    assert files and all("bucket=1" in f for f in files)
    assert _ids(pruned) == {1, 5, 9, 13, 17, 21, 25, 29, 33, 37}
    multi = dr.read_delta(
        spark, table, partition_filter={"bucket": [0, 3]}
    )
    assert all("bucket=0" in f or "bucket=3" in f for f in multi.inputFiles())
    assert multi.count() == 20
    pred = dr.read_delta(
        spark, table,
        partition_filter=lambda pv: int(pv["bucket"]) >= 2,
    )
    assert pred.count() == 20
    with pytest.raises(ValueError, match="not a partition column"):
        dr.read_delta(spark, table, partition_filter={"id": 1})


def test_partitioned_append_and_dml_preserve_layout(spark, tmp_path):
    table = str(tmp_path / "pd")
    df = spark.range(20).select(
        "id", (F.col("id") % 2).cast("int").alias("p")
    )
    dw.create_delta(df, table, partition_by=["p"])
    dw.append_delta(
        spark.range(20, 30).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        table,
    )
    assert dr.read_delta(spark, table).count() == 30
    # partition-aligned DELETE: whole-partition files go as bare removes
    dml.delete_delta(spark, table, "p = 0")
    state = dr._replay(spark, table, None)
    assert all(rel.startswith("p=1/") for rel in state["files"])
    assert dr.read_delta(spark, table).count() == 15
    # row-level UPDATE inside one partition keeps the Hive layout
    dml.update_delta(spark, table, "id = 21", {"id": "121"})
    state = dr._replay(spark, table, None)
    assert all(rel.startswith("p=1/") for rel in state["files"])
    assert 121 in _ids(dr.read_delta(spark, table))
    # and the single-scan read path still applies after DML
    plan = (
        dr.read_delta(spark, table)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Union" not in plan


def test_partitioned_null_partition_value(spark, tmp_path):
    table = str(tmp_path / "pn")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, k string"
    )
    dw.create_delta(df, table, partition_by=["k"])
    got = {(r.id, r.k) for r in dr.read_delta(spark, table).collect()}
    assert got == {(1, "a"), (2, None), (3, "b")}
    only_null = dr.read_delta(
        spark, table, partition_filter=lambda pv: pv["k"] is None
    )
    assert _ids(only_null) == {2}


# --------------------------------------------------------- commit races

def test_racing_appenders_both_land(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "race2")
    dw.create_delta(spark.range(3), table)
    orig = dw._commit
    competitor = spark.range(100, 110)
    raced = {"done": False}

    def racy(tbl, version, actions, **kw):
        # a competing appender steals exactly this version first
        if not raced["done"]:
            raced["done"] = True
            adds = dw._write_data_files(competitor, tbl)
            orig(tbl, version, adds + [dw._commit_info("WRITE")])
        return orig(tbl, version, actions, **kw)

    monkeypatch.setattr(dw, "_commit", racy)
    v = dw.append_delta(spark.range(10, 13), table)
    monkeypatch.setattr(dw, "_commit", orig)
    assert v == 2  # lost version 1, landed at 2
    assert _ids(dr.read_delta(spark, table)) == (
        set(range(3)) | set(range(10, 13)) | set(range(100, 110))
    )


def test_dml_race_against_data_change_raises(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "race3")
    dw.create_delta(spark.range(10), table)
    orig = dw._commit
    competitor = spark.range(50, 55)
    raced = {"done": False}

    def racy(tbl, version, actions, **kw):
        if not raced["done"] and any("remove" in a for a in actions):
            raced["done"] = True
            adds = dw._write_data_files(competitor, tbl)
            orig(tbl, version, adds + [dw._commit_info("WRITE")])
        return orig(tbl, version, actions, **kw)

    monkeypatch.setattr(dw, "_commit", racy)
    with pytest.raises(ValueError, match="concurrent modification"):
        dml.delete_delta(spark, table, "id >= 5")
    monkeypatch.setattr(dw, "_commit", orig)
    # the competitor's append won; the table is uncorrupted
    assert _ids(dr.read_delta(spark, table)) == set(range(10)) | set(
        range(50, 55)
    )


def test_dml_race_against_noop_commit_retries(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "race4")
    dw.create_delta(spark.range(10), table)
    orig = dw._commit
    raced = {"done": False}

    def racy(tbl, version, actions, **kw):
        if not raced["done"] and any("remove" in a for a in actions):
            raced["done"] = True
            orig(tbl, version, [dw._commit_info("NOOP")])
        return orig(tbl, version, actions, **kw)

    monkeypatch.setattr(dw, "_commit", racy)
    dml.delete_delta(spark, table, "id >= 5")
    monkeypatch.setattr(dw, "_commit", orig)
    assert _ids(dr.read_delta(spark, table)) == set(range(5))


def test_partitioned_merge_upserts_and_moves_partitions(spark, tmp_path):
    table = str(tmp_path / "pm")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)], "id long, p int, v double"
    )
    dw.create_delta(df, table, partition_by=["p"])
    # source: replace id 4 in place, MOVE id 5 to partition 0, insert
    # id 100 into a partition and id 200 into a brand-new partition
    src = spark.createDataFrame(
        [(4, 1, 44.0), (5, 0, 55.0), (100, 2, 1.0), (200, 9, 2.0)],
        "id long, p int, v double",
    )
    dml.merge_delta(spark, table, src, on=["id"])
    got = {(r.id, r.p, r.v)
           for r in dr.read_delta(spark, table).collect()}
    expected = {(i, i % 3, float(i)) for i in range(12) if i not in (4, 5)}
    expected |= {(4, 1, 44.0), (5, 0, 55.0), (100, 2, 1.0), (200, 9, 2.0)}
    assert got == expected
    # every file still lives in a Hive partition dir matching its log
    # values — the single-scan read path survives the MERGE
    state = dr._replay(spark, table, None)
    for rel, a in state["files"].items():
        assert rel.split("/")[0] == f"p={a['partitionValues']['p']}"
    plan = (
        dr.read_delta(spark, table)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Union" not in plan
    # moved row is visible under its NEW partition filter
    assert 5 in {
        r.id for r in dr.read_delta(
            spark, table, partition_filter={"p": 0}
        ).collect()
    }


def test_partitioned_merge_not_matched_only(spark, tmp_path):
    table = str(tmp_path / "pm2")
    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 1, 2.0)], "id long, p int, v double"
    )
    dw.create_delta(df, table, partition_by=["p"])
    src = spark.createDataFrame(
        [(2, 1, 99.0), (3, 0, 3.0)], "id long, p int, v double"
    )
    dml.merge_delta(
        spark, table, src, on=["id"], update_when_matched=False
    )
    got = {(r.id, r.v) for r in dr.read_delta(spark, table).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}  # 2 NOT updated
