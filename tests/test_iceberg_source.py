"""format("iceberg_native") — the Spark Python DataSource over native
Iceberg tables: batch reads with field-id column resolution (renames,
added columns), snapshot time travel, and partition pushdown
pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.sources import iceberg_source


@pytest.fixture(scope="module")
def registered(spark):
    iceberg_source.register(spark)
    return spark


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def test_batch_read_and_snapshot_travel(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "t")
    s1 = iw.create_iceberg(
        spark.range(6).select("id", (F.col("id") * 2).alias("x")), table
    )
    iw.append_iceberg(
        spark.range(6, 9).select("id", (F.col("id") * 2).alias("x")), table
    )
    cur = spark.read.format("iceberg_native").load(table)
    assert cur.columns == ["id", "x"]
    assert {(r.id, r.x) for r in cur.collect()} == {
        (i, i * 2) for i in range(9)
    }
    old = (
        spark.read.format("iceberg_native")
        .option("snapshotId", s1)
        .load(table)
    )
    assert _ids(old) == set(range(6))


def test_rename_and_added_columns_resolve_by_field_id(
    registered, tmp_path
):
    spark = registered
    table = str(tmp_path / "rn")
    iw.create_iceberg(
        spark.range(4).select("id", (F.col("id") * 3).alias("x")), table
    )
    iw.rename_column(table, "x", "tripled")
    iw.add_column(table, "note", "string")
    got = spark.read.format("iceberg_native").load(table)
    assert got.columns == ["id", "tripled", "note"]
    rows = {(r.id, r.tripled, r.note) for r in got.collect()}
    assert rows == {(i, i * 3, None) for i in range(4)}


def test_partition_pushdown_prunes_files(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "pp")
    iw.create_iceberg(
        spark.range(30).select(
            "id", (F.col("id") % 3).cast("int").alias("b")
        ),
        table,
        partition_by=["b"],
    )
    from pyspark.sql.datasource import EqualTo

    r = iceberg_source._IceReader(table, None)
    n_all = len(r.partitions())
    list(r.pushFilters([EqualTo(("b",), 1)]))
    assert 0 < len(r.partitions()) < n_all
    got = spark.read.format("iceberg_native").load(table).where("b = 1")
    assert _ids(got) == {i for i in range(30) if i % 3 == 1}


def test_read_after_copy_on_write_dml(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "dml")
    iw.create_iceberg(
        spark.range(20).select("id", F.lit(1.0).alias("w")), table
    )
    idml.delete_iceberg(spark, table, "id >= 15")
    idml.update_iceberg(spark, table, "id = 3", {"w": "9.0"})
    got = spark.read.format("iceberg_native").load(table)
    assert {(r.id, r.w) for r in got.collect()} == {
        (i, 9.0 if i == 3 else 1.0) for i in range(15)
    }
