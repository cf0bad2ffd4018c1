"""Delta TYPE WIDENING (spec table feature): a metadata-only commit
widens a column's logical type; existing files keep their narrow
physical type and reads PROMOTE (Spark 4 parquet upcast), so no data
moves. Contracts: value correctness across mixed-width files, the
``delta.typeWidening`` per-field history, protocol upgrade, stats
data-skipping across the width boundary, DML after widening, refusal
of narrowings / unsupported pairs / partition + generated columns,
and time travel back to the narrow schema.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _mk(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.range(10).select(
        F.col("id").cast("int").alias("x"),
        F.col("id").cast("float").alias("f"),
        (F.col("id") % 3).alias("grp"),
    ).coalesce(2)
    dw.create_delta(df, table)
    return table


def test_widen_is_metadata_only_and_promotes(spark, tmp_path):
    table = _mk(spark, tmp_path)
    import os

    files_before = {
        rel for rel in dr._replay(spark, table, None)["files"]
    }
    v = dw.widen_column_type(spark, table, "x", "long")
    state = dr._replay(spark, table, None)
    assert set(state["files"]) == files_before  # no data job
    df = dr.read_delta(spark, table)
    assert df.schema["x"].dataType.simpleString() == "bigint"
    assert sorted(r.x for r in df.collect()) == list(range(10))
    # history entry with the commit version
    fields = json.loads(state["metaData"]["schemaString"])["fields"]
    xf = next(f for f in fields if f["name"] == "x")
    assert xf["metadata"]["delta.typeWidening"] == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]
    p = state["protocol"]
    assert "typeWidening" in p["readerFeatures"]
    assert "typeWidening" in p["writerFeatures"]
    # time travel BEFORE the widening keeps the narrow schema
    old = dr.read_delta(spark, table, version=v - 1)
    assert old.schema["x"].dataType.simpleString() == "int"


def test_append_beyond_narrow_range_and_mixed_scan(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.widen_column_type(spark, table, "x", "long")
    big = 2**40
    dw.append_delta(
        spark.createDataFrame(
            [(big, 1.5, 0), (big + 1, 2.5, 1)],
            "x long, f float, grp long",
        ),
        table,
    )
    got = sorted(r.x for r in dr.read_delta(spark, table).collect())
    assert got == list(range(10)) + [big, big + 1]


def test_float_to_double_and_second_widening(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.widen_column_type(spark, table, "f", "double")
    df = dr.read_delta(spark, table)
    assert df.schema["f"].dataType.simpleString() == "double"
    assert {round(r.f, 1) for r in df.collect()} == {
        float(i) for i in range(10)
    }
    # a second widening on another column appends to the feature set
    v2 = dw.widen_column_type(spark, table, "x", "long")
    state = dr._replay(spark, table, None)
    fields = json.loads(state["metaData"]["schemaString"])["fields"]
    xf = next(f for f in fields if f["name"] == "x")
    assert xf["metadata"]["delta.typeWidening"][0]["tableVersion"] == v2


def test_stats_skipping_across_width_boundary(spark, tmp_path):
    table = str(tmp_path / "skip")
    dw.create_delta(
        spark.range(100).select(F.col("id").cast("int").alias("x"))
        .repartitionByRange(4, "x"),
        table,
    )
    dw.widen_column_type(spark, table, "x", "long")
    dw.append_delta(
        spark.range(1000, 1100).select(F.col("id").alias("x"))
        .repartitionByRange(4, "x"),
        table,
    )
    full = dr.plan_file_list(spark, table)["files"]
    pruned = dr.plan_file_list(
        spark, table, predicates=[("x", ">=", 1000)]
    )["files"]
    # narrow files (int stats) prune out under the long predicate
    assert len(full) == 8 and len(pruned) == 4
    got = dr.read_delta(spark, table, predicates=[("x", ">=", 1000)])
    assert got.count() == 100


def test_dml_after_widening(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.widen_column_type(spark, table, "x", "long")
    dml.update_delta(spark, table, "x = 3", {"x": str(2**35)})
    got = sorted(r.x for r in dr.read_delta(spark, table).collect())
    assert 2**35 in got and 3 not in got


def test_refusals(spark, tmp_path):
    table = str(tmp_path / "r")
    dw.create_delta(
        spark.range(4).select(
            F.col("id").cast("int").alias("x"),
            (F.col("id") % 2).cast("string").alias("p"),
        ),
        table,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="not a supported promotion"):
        dw.widen_column_type(spark, table, "x", "float")
    with pytest.raises(NotImplementedError, match="PARTITION"):
        dw.widen_column_type(spark, table, "p", "long")
    with pytest.raises(ValueError, match="not in table"):
        dw.widen_column_type(spark, table, "nope", "long")
    gen = str(tmp_path / "g")
    dw.create_delta(
        spark.range(4).select(F.col("id").cast("int").alias("x")),
        gen,
        generated={"x2": "x + 1"},
    )
    with pytest.raises(NotImplementedError, match="generated"):
        dw.widen_column_type(spark, gen, "x2", "long")


def test_checkpoint_preserves_widened_schema(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v = dw.widen_column_type(spark, table, "x", "long")
    import os

    cv = dw.write_checkpoint(spark, table)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= cv:
            os.unlink(os.path.join(log, f))
    df = dr.read_delta(spark, table)
    assert df.schema["x"].dataType.simpleString() == "bigint"
    state = dr._replay(spark, table, None)
    fields = json.loads(state["metaData"]["schemaString"])["fields"]
    xf = next(f for f in fields if f["name"] == "x")
    assert xf["metadata"]["delta.typeWidening"][0]["tableVersion"] == v


# ---------------------------------------------------------------- Iceberg

from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir  # noqa: E402
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw  # noqa: E402
from dst_spark_k8_lakehouse_spark.plans.dml import execute_native_sql  # noqa: E402


def test_iceberg_promotion_mixed_scan_and_bounds(spark, tmp_path):
    table = str(tmp_path / "ice")
    iw.create_iceberg(
        spark.range(100).select(F.col("id").cast("int").alias("x"))
        .repartitionByRange(4, "x"),
        table,
    )
    iw.promote_column_type(table, "x", "long")
    df = ir.read_iceberg(spark, table)
    assert df.schema["x"].dataType.simpleString() == "bigint"
    iw.append_iceberg(
        spark.range(1000, 1100).select(F.col("id").alias("x"))
        .repartitionByRange(4, "x"),
        table,
    )
    got = ir.read_iceberg(spark, table)
    assert got.count() == 200
    # data skipping across the promotion boundary: the PRE-promotion
    # manifests carry 4-byte bounds for the now-long column — the
    # width-aware decode must prune them under a long predicate
    full = ir.plan_file_list(spark, table)["data"]
    pruned = ir.plan_file_list(
        spark, table, predicates=[("x", ">=", 1000)]
    )["data"]
    assert len(full) == 8 and len(pruned) == 4
    n = ir.read_iceberg(
        spark, table, predicates=[("x", ">=", 1000)]
    ).count()
    assert n == 100


def test_iceberg_promotion_refusals(spark, tmp_path):
    table = str(tmp_path / "icer")
    iw.create_iceberg(
        spark.range(10).select(
            F.col("id").cast("int").alias("x"),
            (F.col("id") % 3).cast("int").alias("p"),
        ),
        table,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="promotion set"):
        iw.promote_column_type(table, "x", "double")
    with pytest.raises(NotImplementedError, match="partition source"):
        iw.promote_column_type(table, "p", "long")
    with pytest.raises(ValueError, match="no column"):
        iw.promote_column_type(table, "nope", "long")


def test_alter_column_type_statement_both_formats(spark, tmp_path):
    d = str(tmp_path / "d")
    dw.create_delta(
        spark.range(5).select(F.col("id").cast("int").alias("x")), d
    )
    execute_native_sql(
        spark, "ALTER TABLE t ALTER COLUMN x TYPE BIGINT", {"t": d}
    )
    assert dr.read_delta(spark, d).schema["x"].dataType.simpleString() \
        == "bigint"
    i = str(tmp_path / "i")
    iw.create_iceberg(
        spark.range(5).select(F.col("id").cast("float").alias("f")), i
    )
    execute_native_sql(
        spark, "ALTER TABLE t ALTER COLUMN f TYPE DOUBLE", {"t": i}
    )
    assert ir.read_iceberg(spark, i).schema["f"].dataType.simpleString() \
        == "double"
    with pytest.raises(NotImplementedError, match="widening set"):
        execute_native_sql(
            spark, "ALTER TABLE t ALTER COLUMN x TYPE DECIMAL", {"t": d}
        )
