"""Copy-on-write row-level DML and metadata-only schema evolution on
NATIVE (jar-free) Iceberg v1 tables — the surface the reference runs
through Iceberg 1.9 jars (``02_iceberg_demo.ipynb``: UPDATE/DELETE at
cells 88-96, ADD/RENAME COLUMN at 122-123)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def _data_files(table):
    data = os.path.join(table, "data")
    return {
        os.path.join(data, f)
        for f in os.listdir(data)
        if f.endswith(".parquet")
    }


def test_delete_full_and_partial_files(spark, tmp_path):
    table = str(tmp_path / "idel")
    # 4 files of 25 rows each, ids 0..99
    df = spark.range(100).select(
        "id", (F.col("id") % 4).alias("k")
    ).repartition(4, "k")
    s1 = iw.create_iceberg(df, table)
    before = _data_files(table)
    # k=0 rows live in exactly one file → full-file drop, no rewrite;
    # id=1 hits one other file partially → rewrite
    s2 = idml.delete_iceberg(spark, table, "k = 0 OR id = 1")
    assert s2 != s1
    cur = ir.read_iceberg(spark, table)
    assert _ids(cur) == {i for i in range(100) if i % 4 != 0 and i != 1}
    # time travel to the pre-DML snapshot still shows everything
    assert _ids(ir.read_iceberg(spark, table, snapshot_id=s1)) == set(
        range(100)
    )
    # untouched files were NOT rewritten (their paths survive)
    live = {ir._strip_uri(f) for f in cur.inputFiles()}
    assert live & before, "every file was rewritten — not file-granular"


def test_delete_no_match_is_noop(spark, tmp_path):
    table = str(tmp_path / "inoop")
    s1 = iw.create_iceberg(spark.range(10), table)
    s2 = idml.delete_iceberg(spark, table, "id > 1000")
    assert s2 == s1
    assert len(ir.iceberg_snapshots(table)) == 1


def test_update_rewrites_only_matching_files(spark, tmp_path):
    table = str(tmp_path / "iupd")
    df = spark.range(100).select(
        "id", (F.col("id") % 4).alias("k"), F.lit(1.0).alias("w")
    ).repartition(4, "k")
    s1 = iw.create_iceberg(df, table)
    before = _data_files(table)
    idml.update_iceberg(spark, table, "k = 2", {"w": "w * 10"})
    cur = ir.read_iceberg(spark, table)
    got = {(r.id, r.w) for r in cur.collect()}
    assert got == {(i, 10.0 if i % 4 == 2 else 1.0) for i in range(100)}
    live = {ir._strip_uri(f) for f in cur.inputFiles()}
    assert live & before, "untouched files must carry forward"
    with pytest.raises(ValueError, match="unknown column"):
        idml.update_iceberg(spark, table, "k = 1", {"nope": "1"})
    # pre-update snapshot unchanged
    old = {(r.id, r.w)
           for r in ir.read_iceberg(spark, table, snapshot_id=s1).collect()}
    assert old == {(i, 1.0) for i in range(100)}


def test_rename_column_field_id_read(spark, tmp_path):
    table = str(tmp_path / "irn")
    iw.create_iceberg(
        spark.range(5).select("id", (F.col("id") * 3).alias("x")), table
    )
    before = _data_files(table)
    iw.rename_column(table, "x", "tripled")
    assert _data_files(table) == before  # metadata-only
    cur = ir.read_iceberg(spark, table)
    assert cur.columns == ["id", "tripled"]
    assert {r.tripled for r in cur.collect()} == {0, 3, 6, 9, 12}
    with pytest.raises(ValueError, match="already exists"):
        iw.rename_column(table, "id", "tripled")
    # appends after the rename keep working (schema check uses the
    # new name; files embed the same field ids)
    iw.append_iceberg(
        spark.range(5, 7).select("id", (F.col("id") * 3).alias("tripled")),
        table,
    )
    assert {r.tripled for r in ir.read_iceberg(spark, table).collect()} == {
        0, 3, 6, 9, 12, 15, 18,
    }
    # DML on the renamed column resolves too
    idml.delete_iceberg(spark, table, "tripled >= 15")
    assert _ids(ir.read_iceberg(spark, table)) == {0, 1, 2, 3, 4}


def test_add_column_metadata_only(spark, tmp_path):
    table = str(tmp_path / "iac")
    iw.create_iceberg(spark.range(3), table)
    before = _data_files(table)
    iw.add_column(table, "note", "string")
    assert _data_files(table) == before
    cur = ir.read_iceberg(spark, table)
    assert cur.columns == ["id", "note"]
    assert [r.note for r in cur.collect()] == [None] * 3
    with pytest.raises(ValueError, match="already exists"):
        iw.add_column(table, "note", "string")


def test_idless_files_rename_raises_not_nulls(spark, tmp_path):
    """Files without parquet field ids + a renamed schema must raise,
    never silently null the column (external id-less writers)."""
    table = str(tmp_path / "noid")
    iw.create_iceberg(
        spark.range(3).select("id", (F.col("id") * 2).alias("x")), table
    )
    # strip the field ids by rewriting the data files with plain Spark
    data = os.path.join(table, "data")
    for f in os.listdir(data):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(data, f)
        plain = spark.read.parquet(p).collect()
        df = spark.createDataFrame(plain, "id long, x long")
        tmp = str(tmp_path / "rewrite")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(g for g in os.listdir(tmp) if g.endswith(".parquet"))
        os.replace(os.path.join(tmp, part), p)
    iw.rename_column(table, "x", "y")
    with pytest.raises(NotImplementedError, match="field ids"):
        ir.read_iceberg(spark, table).collect()


def test_merge_upserts_and_moves_partitions(spark, tmp_path):
    table = str(tmp_path / "im")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)], "id long, p int, v double"
    )
    s1 = iw.create_iceberg(df, table, partition_by=["p"])
    src = spark.createDataFrame(
        [(4, 1, 44.0), (5, 0, 55.0), (100, 2, 1.0), (200, 9, 2.0)],
        "id long, p int, v double",
    )
    idml.merge_iceberg(spark, table, src, on=["id"])
    got = {(r.id, r.p, r.v) for r in ir.read_iceberg(spark, table).collect()}
    expected = {(i, i % 3, float(i)) for i in range(12) if i not in (4, 5)}
    expected |= {(4, 1, 44.0), (5, 0, 55.0), (100, 2, 1.0), (200, 9, 2.0)}
    assert got == expected
    # the moved row answers a manifest-pruned read in its NEW partition
    assert 5 in _ids(
        ir.read_iceberg(spark, table, partition_filter={"p": 0})
    )
    assert 200 in _ids(
        ir.read_iceberg(spark, table, partition_filter={"p": 9})
    )
    # pre-merge snapshot unchanged
    assert _ids(ir.read_iceberg(spark, table, snapshot_id=s1)) == set(
        range(12)
    )
    with pytest.raises(ValueError, match="duplicate"):
        idml.merge_iceberg(
            spark, table,
            spark.createDataFrame(
                [(1, 0, 1.0), (1, 0, 2.0)], "id long, p int, v double"
            ),
            on=["id"],
        )


def test_merge_clause_flags(spark, tmp_path):
    table = str(tmp_path / "imf")
    iw.create_iceberg(
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0)], "id long, v double"
        ),
        table,
    )
    src = spark.createDataFrame(
        [(2, 99.0), (3, 3.0)], "id long, v double"
    )
    # insert-only
    idml.merge_iceberg(
        spark, table, src, on=["id"], update_when_matched=False
    )
    got = {(r.id, r.v) for r in ir.read_iceberg(spark, table).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}
    # update-only: 3 already exists now; update it, do NOT insert 7
    idml.merge_iceberg(
        spark, table,
        spark.createDataFrame([(3, 33.0), (7, 7.0)], "id long, v double"),
        on=["id"], insert_when_not_matched=False,
    )
    got = {(r.id, r.v) for r in ir.read_iceberg(spark, table).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 33.0)}
