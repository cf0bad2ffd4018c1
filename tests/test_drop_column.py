"""DROP COLUMN, both formats — metadata-only removal (data files keep
their bytes; reads stop projecting), refusals for every semantic
consumer, and the RESURRECTION guard: a re-added same-named column
must read NULL/new values, never the dropped column's old bytes
(Delta: UUID physical names for post-enablement columns; Iceberg:
fresh field id, files resolve by embedded id).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import dml
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _mk_delta(spark, tmp_path, name="d", **kw):
    table = str(tmp_path / name)
    df = spark.range(6).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    ).coalesce(1)
    dw.create_delta(df, table, **kw)
    return table


def _mk_iceberg(spark, tmp_path, name="i"):
    table = str(tmp_path / name)
    df = spark.range(6).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    ).coalesce(1)
    iw.create_iceberg(df, table)
    return table


def test_delta_drop_hides_column_time_travel_keeps_it(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    v = dw.drop_column(spark, table, "v")
    df = dr.read_delta(spark, table)
    assert df.columns == ["k", "s"]
    assert df.count() == 6
    old = dr.read_delta(spark, table, version=v - 1)
    assert set(old.columns) == {"k", "v", "s"}
    assert {r.v for r in old.collect()} == {0, 10, 20, 30, 40, 50}
    # mapping got enabled by the drop
    conf = dr._replay(spark, table, None)["metaData"]["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"


def test_delta_no_resurrection_on_readd(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.drop_column(spark, table, "v")
    dw.add_column(spark, table, "v", "long")
    rows = dr.read_delta(spark, table).collect()
    # the re-added v reads NULL everywhere — never the dropped bytes
    assert all(r.v is None for r in rows)
    # because its physical name is fresh, not the old one
    meta = dr._replay(spark, table, None)["metaData"]
    f = next(
        f for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "v"
    )
    assert f["metadata"]["delta.columnMapping.physicalName"].startswith(
        "col-"
    )


def test_delta_drop_refusals(spark, tmp_path):
    table = str(tmp_path / "p")
    dw.create_delta(
        spark.range(4).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("part")
        ).coalesce(1),
        table,
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition"):
        dw.drop_column(spark, table, "part")
    g = str(tmp_path / "g")
    dw.create_delta(
        spark.range(4).select(F.col("id").alias("k")).coalesce(1),
        g,
        generated={"k2": "k * 2"},
    )
    with pytest.raises(ValueError, match="generation-expression"):
        dw.drop_column(spark, g, "k")
    dw.drop_column(spark, g, "k2")  # the generated column itself: ok
    assert dr.read_delta(spark, g).columns == ["k"]
    c = _mk_delta(spark, tmp_path, name="c")
    dw.add_check_constraint(spark, c, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK"):
        dw.drop_column(spark, c, "v")
    i = str(tmp_path / "ident")
    dw.create_delta(
        spark.range(3).select(F.col("id").alias("k")).coalesce(1),
        i,
        identity={"rid": {"start": 1, "step": 1, "always": True}},
    )
    with pytest.raises(ValueError, match="identity"):
        dw.drop_column(spark, i, "rid")


def test_delta_writes_after_drop(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.drop_column(spark, table, "v")
    dw.append_delta(
        spark.createDataFrame([(100, "x")], "k long, s string"), table
    )
    df = dr.read_delta(spark, table)
    assert df.count() == 7 and df.columns == ["k", "s"]


def test_iceberg_drop_and_no_resurrection(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.drop_column(spark, table, "v")
    df = ir.read_iceberg(spark, table)
    assert df.columns == ["k", "s"] and df.count() == 6
    meta, _ = iw._load_meta(table)
    # last-column-id never decrements: the dropped id is not reused
    last = int(meta["last-column-id"])
    iw.add_column(table, "v", "long")
    meta2, _ = iw._load_meta(table)
    f = next(
        f for f in meta2["schema"]["fields"] if f["name"] == "v"
    )
    assert int(f["id"]) == last + 1
    rows = ir.read_iceberg(spark, table).collect()
    assert all(r.v is None for r in rows)  # fresh id -> no old bytes


def test_iceberg_drop_refusals(spark, tmp_path):
    table = str(tmp_path / "ip")
    iw.create_iceberg(
        spark.range(4).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        ).coalesce(1),
        table,
        partition_by=["grp"],
    )
    with pytest.raises(ValueError, match="partition"):
        iw.drop_column(spark, table, "grp")
    s = _mk_iceberg(spark, tmp_path, name="is")
    iw.set_sort_order(s, ["v"])
    with pytest.raises(ValueError, match="sort-order"):
        iw.drop_column(spark, s, "v")
    e = str(tmp_path / "ie")
    iw.create_iceberg(
        spark.range(6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).coalesce(1),
        e,
        format_version=2,
    )
    from dst_spark_k8_lakehouse_spark.plans import iceberg_mor

    iceberg_mor.delete_keys_mor(
        spark, e, spark.createDataFrame([(10,), (30,)], "v long")
    )
    with pytest.raises(ValueError, match="equality-delete"):
        iw.drop_column(spark, e, "v")


def test_statement_faces(spark, tmp_path):
    d = _mk_delta(spark, tmp_path, name="sd")
    i = _mk_iceberg(spark, tmp_path, name="si")
    tables = {"d": d, "i": i}
    dml.execute_native_sql(spark, "ALTER TABLE d DROP COLUMN v", tables)
    dml.execute_native_sql(spark, "ALTER TABLE i DROP COLUMN v", tables)
    assert dr.read_delta(spark, d).columns == ["k", "s"]
    assert ir.read_iceberg(spark, i).columns == ["k", "s"]


def test_optimize_where_scopes_compaction(spark, tmp_path):
    """OPTIMIZE t WHERE part = x (r10): only the named partition's
    files rewrite; every other partition's file set is untouched."""
    table = str(tmp_path / "ow")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("part")
    ).repartition(4)
    dw.create_delta(df, table, partition_by=["part"])
    before = {
        rel: a for rel, a in dr._replay(spark, table, None)["files"].items()
    }
    part1_before = {r for r in before if "part=1" in r}
    v = dml.execute_native_sql(
        spark, "OPTIMIZE t WHERE part = 0", {"t": table}
    )
    assert v >= 0
    after = dr._replay(spark, table, None)["files"]
    part1_after = {r for r in after if "part=1" in r}
    part0_after = {r for r in after if "part=0" in r}
    assert part1_after == part1_before          # untouched
    assert len(part0_after) == 1                # compacted
    rows = {r.k for r in dr.read_delta(spark, table).collect()}
    assert rows == set(range(40))
    # unpartitioned tables refuse the WHERE form
    u = str(tmp_path / "owu")
    dw.create_delta(spark.range(4).select(F.col("id").alias("k")), u)
    with pytest.raises(ValueError, match="unpartitioned"):
        dml.execute_native_sql(
            spark, "OPTIMIZE u WHERE k = 1", {"u": u}
        )
    # WHERE + ZORDER refuses loudly
    with pytest.raises(NotImplementedError, match="ZORDER"):
        dml.execute_native_sql(
            spark, "OPTIMIZE t WHERE part = 0 ZORDER BY (k)",
            {"t": table},
        )
