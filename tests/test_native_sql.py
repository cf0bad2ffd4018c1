"""execute_native_sql: the reference notebooks' statement TEXT
(UPDATE / DELETE / MERGE / VACUUM / OPTIMIZE [ZORDER BY] / RESTORE /
ALTER TABLE ...) dispatched onto native Delta and Iceberg tables by
format detection — skeleton-parsed, expressions verbatim, loud on
anything unrecognized."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.plans.dml import execute_native_sql


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def test_update_delete_both_formats(spark, tmp_path):
    td = str(tmp_path / "d")
    ti = str(tmp_path / "i")
    dw.create_delta(_df(spark, 0, 10), td)
    iw.create_iceberg(_df(spark, 0, 10), ti)
    tabs = {"t": td, "u": ti}
    execute_native_sql(spark, "UPDATE t SET x = 0.0 WHERE id < 2", tabs)
    execute_native_sql(spark, "DELETE FROM t WHERE id >= 8;", tabs)
    execute_native_sql(spark, "UPDATE u SET x = -1.0 WHERE id = 5", tabs)
    execute_native_sql(spark, "DELETE FROM u WHERE id > 7", tabs)
    got_d = {(r.id, r.x) for r in dr.read_delta(spark, td).collect()}
    assert got_d == {(i, 0.0 if i < 2 else i * 2.0) for i in range(8)}
    got_i = {(r.id, r.x) for r in ir.read_iceberg(spark, ti).collect()}
    assert got_i == {
        (i, -1.0 if i == 5 else i * 2.0) for i in range(8)
    }


def test_merge_text_with_dataframe_source(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 5), td)
    src = spark.createDataFrame([(2, 50.0), (9, 90.0)],
                                "id long, x double")
    execute_native_sql(
        spark,
        "MERGE INTO t AS a USING s AS b ON a.id = b.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": td},
        sources={"s": src},
    )
    got = {(r.id, r.x) for r in dr.read_delta(spark, td).collect()}
    assert got == {(0, 0.0), (1, 2.0), (2, 50.0), (3, 6.0),
                   (4, 8.0), (9, 90.0)}


def test_maintenance_statements(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 100).repartition(6), td)   # v0
    tabs = {"t": td}
    # OPTIMIZE ZORDER rewrites (dataChange=false)
    v = execute_native_sql(spark, "OPTIMIZE t ZORDER BY (x, id)", tabs)
    assert v == 1
    assert {r.id for r in dr.read_delta(spark, td).collect()} \
        == set(range(100))
    # RESTORE back to the pre-zorder layout
    execute_native_sql(spark, "RESTORE TABLE t TO VERSION AS OF 0", tabs)
    # VACUUM drops the zordered files (only v2's state retained)
    execute_native_sql(spark, "VACUUM t RETAIN 1 VERSIONS", tabs)
    assert {r.id for r in dr.read_delta(spark, td).collect()} \
        == set(range(100))


def test_alter_and_tblproperties(spark, tmp_path):
    td = str(tmp_path / "d")
    ti = str(tmp_path / "i")
    dw.create_delta(_df(spark, 0, 3), td)
    iw.create_iceberg(_df(spark, 0, 3), ti)
    tabs = {"t": td, "u": ti}
    execute_native_sql(spark, "ALTER TABLE t ADD COLUMN note string", tabs)
    assert "note" in dr.read_delta(spark, td).columns
    execute_native_sql(spark, "ALTER TABLE u RENAME COLUMN x TO y", tabs)
    assert "y" in ir.read_iceberg(spark, ti).columns
    execute_native_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed' = 'true')",
        tabs,
    )
    from dst_spark_k8_lakehouse_spark.plans import delta_cdf

    state = dr._replay(spark, td, None)
    assert delta_cdf.cdf_enabled(state["metaData"])


def test_unrecognized_raises(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 3), td)
    with pytest.raises(ValueError, match="not a supported"):
        execute_native_sql(spark, "TRUNCATE TABLE t", {"t": td})
    with pytest.raises(ValueError, match="unknown table"):
        execute_native_sql(spark, "DELETE FROM nope", {"t": td})
    with pytest.raises(NotImplementedError, match="RESTORE"):
        ti = str(tmp_path / "i")
        iw.create_iceberg(_df(spark, 0, 3), ti)
        execute_native_sql(
            spark, "RESTORE TABLE u TO VERSION AS OF 0", {"u": ti}
        )
