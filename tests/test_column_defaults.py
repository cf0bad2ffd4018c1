"""COLUMN DEFAULT VALUES, both formats — and their deliberately
different semantics, pinned side by side:

- Delta (``allowColumnDefaults`` writer feature): a default is a
  WRITE-side contract. ``CURRENT_DEFAULT`` field metadata makes every
  subsequent write that omits the column materialize the expression;
  rows already on disk still read NULL.
- Iceberg (spec DEFAULT VALUES): ``initial-default`` is a READ-side
  contract — files written before the column existed read the value,
  with zero data movement — while ``write-default`` fills omitting
  writers, and the two evolve independently (``initial-default`` is
  immutable, ``write-default`` follows ALTER COLUMN SET DEFAULT).
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import dml
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


# ------------------------------------------------------------ Delta


def _mk_delta(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).coalesce(1)
    dw.create_delta(df, table)
    return table


def test_delta_default_fills_omitted_column(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.add_column(spark, table, "src", "string")
    dw.set_column_default(spark, table, "src", "'backfill'")
    # this append omits src -> the default materializes physically
    dw.append_delta(
        spark.range(4, 6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        table,
    )
    rows = {r.k: r.src for r in dr.read_delta(spark, table).collect()}
    # old rows (written before the default) read NULL — Delta defaults
    # are write-side only
    assert rows[0] is None and rows[3] is None
    assert rows[4] == "backfill" and rows[5] == "backfill"


def test_delta_default_protocol_and_metadata(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.add_column(spark, table, "n", "int")
    dw.set_column_default(spark, table, "n", "7")
    state = dr._replay(spark, table, None)
    p = state["protocol"]
    assert p["minWriterVersion"] == 7
    assert "allowColumnDefaults" in p["writerFeatures"]
    fields = json.loads(state["metaData"]["schemaString"])["fields"]
    nf = next(f for f in fields if f["name"] == "n")
    assert nf["metadata"]["CURRENT_DEFAULT"] == "7"


def test_delta_explicit_value_beats_default(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.add_column(spark, table, "n", "int")
    dw.set_column_default(spark, table, "n", "7")
    dw.append_delta(
        spark.createDataFrame(
            [(100, 0, None), (101, 0, 3)], "k long, v long, n int"
        ),
        table,
    )
    rows = {r.k: r.n for r in dr.read_delta(spark, table).collect()}
    # a write that PROVIDES the column wins — including explicit null
    assert rows[100] is None and rows[101] == 3


def test_delta_drop_default_returns_to_null_fill(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.add_column(spark, table, "n", "int")
    dw.set_column_default(spark, table, "n", "7")
    dw.drop_column_default(spark, table, "n")
    dw.append_delta(
        spark.createDataFrame([(200, 0)], "k long, v long"), table
    )
    rows = {r.k: r.n for r in dr.read_delta(spark, table).collect()}
    assert rows[200] is None
    # dropping twice refuses
    with pytest.raises(ValueError, match="no DEFAULT"):
        dw.drop_column_default(spark, table, "n")


def test_delta_default_expression_not_just_literal(spark, tmp_path):
    table = _mk_delta(spark, tmp_path)
    dw.add_column(spark, table, "tag", "string")
    dw.set_column_default(spark, table, "tag", "upper('ab') || '-x'")
    dw.append_delta(
        spark.createDataFrame([(300, 0)], "k long, v long"), table
    )
    rows = {r.k: r.tag for r in dr.read_delta(spark, table).collect()}
    assert rows[300] == "AB-x"


def test_delta_default_refusals(spark, tmp_path):
    table = str(tmp_path / "p")
    dw.create_delta(
        spark.range(4).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("part")
        ),
        table,
        partition_by=["part"],
    )
    with pytest.raises(NotImplementedError, match="partition"):
        dw.set_column_default(spark, table, "part", "0")
    # a default whose expression does not evaluate fails at DDL time
    dw.add_column(spark, table, "n", "int")
    with pytest.raises(Exception):
        dw.set_column_default(spark, table, "n", "no_such_fn(1)")
    # and never landed
    assert "CURRENT_DEFAULT" not in json.dumps(
        dr._replay(spark, table, None)["metaData"]["schemaString"]
    )


def test_delta_non_nullable_with_default_fills(spark, tmp_path):
    table = str(tmp_path / "nn")
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
    ])
    dw.create_delta(
        spark.createDataFrame([(1, 5)], schema), table
    )
    dw.set_column_default(spark, table, "n", "9")
    dw.append_delta(
        spark.createDataFrame(
            [(2,)],
            T.StructType([T.StructField("k", T.LongType(), False)]),
        ),
        table,
    )
    rows = {r.k: r.n for r in dr.read_delta(spark, table).collect()}
    assert rows[2] == 9


# ---------------------------------------------------------- Iceberg


def _mk_iceberg(spark, tmp_path, name="i"):
    table = str(tmp_path / name)
    df = spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).coalesce(1)
    iw.create_iceberg(df, table)
    return table


def test_iceberg_initial_default_read_for_old_files(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "bonus", "double", default=1.5)
    rows = {r.k: r.bonus for r in ir.read_iceberg(spark, table).collect()}
    # files written BEFORE the column existed read the default, not null
    assert rows == {0: 1.5, 1: 1.5, 2: 1.5, 3: 1.5}


def test_iceberg_write_default_fills_omitting_writer(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "bonus", "double", default=1.5)
    before = {
        e["path"] for e in ir.plan_file_list(spark, table)["data"]
    }
    iw.append_iceberg(
        spark.createDataFrame([(10, 0)], "k long, v long"), table
    )
    # the new file carries the column PHYSICALLY (write-default is a
    # write-time fill, not a read trick)
    import pyarrow.parquet as pq

    plan = ir.plan_file_list(spark, table)
    new_files = {e["path"] for e in plan["data"]} - before
    assert new_files
    for p in new_files:
        cols = {f.name for f in pq.ParquetFile(p).schema_arrow}
        assert "bonus" in cols
    rows = {r.k: r.bonus for r in ir.read_iceberg(spark, table).collect()}
    assert rows[10] == 1.5 and rows[0] == 1.5


def test_iceberg_explicit_null_stays_null(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "bonus", "double", default=1.5)
    iw.append_iceberg(
        spark.createDataFrame(
            [(20, 0, None), (21, 0, 9.0)], "k long, v long, bonus double"
        ),
        table,
    )
    rows = {r.k: r.bonus for r in ir.read_iceberg(spark, table).collect()}
    # a file that HAS the field keeps stored values — including null
    assert rows[20] is None and rows[21] == 9.0
    assert rows[0] == 1.5  # while pre-column files still read 1.5


def test_iceberg_write_default_evolves_initial_does_not(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "bonus", "double", default=1.5)
    iw.set_write_default(table, "bonus", 2.5)
    iw.append_iceberg(
        spark.createDataFrame([(30, 0)], "k long, v long"), table
    )
    meta, _ = iw._load_meta(table)
    bf = next(
        f for f in meta["schema"]["fields"] if f["name"] == "bonus"
    )
    assert bf["initial-default"] == 1.5  # immutable read contract
    assert bf["write-default"] == 2.5
    rows = {r.k: r.bonus for r in ir.read_iceberg(spark, table).collect()}
    assert rows[30] == 2.5 and rows[0] == 1.5
    # dropping the write-default: omitting writes REFUSE again (the
    # engine's strict write-schema contract — only a declared default
    # licenses omission)
    iw.set_write_default(table, "bonus", None)
    with pytest.raises(ValueError, match="write schema"):
        iw.append_iceberg(
            spark.createDataFrame([(31, 0)], "k long, v long"), table
        )
    rows = {r.k: r.bonus for r in ir.read_iceberg(spark, table).collect()}
    assert rows[0] == 1.5


def test_iceberg_default_types_round_trip(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "s", "string", default="x'y")
    iw.add_column(table, "b", "boolean", default=True)
    iw.add_column(table, "d", "date", default="2024-03-01")
    iw.add_column(table, "n", "int", default=42)
    row = ir.read_iceberg(spark, table).filter("k = 0").head()
    assert row.s == "x'y"
    assert row.b is True
    assert row.d == datetime.date(2024, 3, 1)
    assert row.n == 42
    # type mismatches refuse at DDL time
    with pytest.raises(TypeError):
        iw.add_column(table, "bad", "int", default="nope")


def test_iceberg_default_survives_rename(spark, tmp_path):
    table = _mk_iceberg(spark, tmp_path)
    iw.add_column(table, "bonus", "double", default=1.5)
    iw.append_iceberg(
        spark.createDataFrame([(40, 0)], "k long, v long"), table
    )
    iw.rename_column(table, "bonus", "prize")
    rows = {r.k: r.prize for r in ir.read_iceberg(spark, table).collect()}
    # field-id resolution: old files still read the initial-default,
    # the filled file still reads its stored value
    assert rows[0] == 1.5 and rows[40] == 1.5


# ---------------------------------------------------- statement face


def test_statement_faces(spark, tmp_path):
    d = _mk_delta(spark, tmp_path, "sd")
    i = _mk_iceberg(spark, tmp_path, "si")
    tables = {"d": d, "i": i}
    dml.execute_native_sql(
        spark, "ALTER TABLE d ADD COLUMN src string", tables
    )
    dml.execute_native_sql(
        spark, "ALTER TABLE d ALTER COLUMN src SET DEFAULT 'web'",
        tables,
    )
    dw.append_delta(
        spark.createDataFrame([(50, 0)], "k long, v long"), d
    )
    assert {
        r.src for r in dr.read_delta(spark, d).filter("k = 50").collect()
    } == {"web"}
    dml.execute_native_sql(
        spark, "ALTER TABLE d ALTER COLUMN src DROP DEFAULT", tables
    )
    with pytest.raises(NotImplementedError, match="ADD COLUMN"):
        dml.execute_native_sql(
            spark, "ALTER TABLE d ADD COLUMN n2 int DEFAULT 3", tables
        )
    dml.execute_native_sql(
        spark, "ALTER TABLE i ADD COLUMN bonus double DEFAULT 1.5",
        tables,
    )
    assert {
        r.bonus for r in ir.read_iceberg(spark, i).collect()
    } == {1.5}
    dml.execute_native_sql(
        spark, "ALTER TABLE i ALTER COLUMN bonus SET DEFAULT 2.5",
        tables,
    )
    meta, _ = iw._load_meta(i)
    bf = next(
        f for f in meta["schema"]["fields"] if f["name"] == "bonus"
    )
    assert bf["write-default"] == 2.5 and bf["initial-default"] == 1.5
    # expressions refuse on the Iceberg side (defaults are VALUES)
    with pytest.raises(ValueError, match="not a literal"):
        dml.execute_native_sql(
            spark,
            "ALTER TABLE i ALTER COLUMN bonus SET DEFAULT upper('x')",
            tables,
        )
