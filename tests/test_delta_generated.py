"""Delta GENERATED COLUMNS (``plans/delta_generated``): computed on
write when missing, validated when supplied, stale-making UPDATEs
refused, and source-column predicates pruning generated partition
columns through the recognized expression shapes — the Delta idiom
for hidden partitioning (Iceberg spells it ``days(ts)``)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_generated as dg
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _events(spark, n=400):
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1 + i % 10, 8 + i % 12),
            float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp_ntz, x double")


@pytest.fixture()
def gen_table(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(
        _events(spark),
        table,
        partition_by=["d"],
        generated={"d": "CAST(ts AS DATE)"},
    )
    return table


def test_create_computes_and_records_expression(spark, gen_table):
    state = dr._replay(spark, gen_table, None)
    assert dg.generation_exprs(state["metaData"]) == {
        "d": "CAST(ts AS DATE)"
    }
    assert state["protocol"]["minWriterVersion"] >= 4
    # Hive layout by the generated column
    assert any(
        seg.startswith("d=") for seg in os.listdir(gen_table)
        if not seg.startswith("_")
    )
    got = dr.read_delta(spark, gen_table)
    assert got.count() == 400
    assert got.where("d <> CAST(ts AS DATE)").count() == 0


def test_predicates_prune_generated_partition(spark, gen_table):
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 6)  # days 3,4,5
    got = dr.read_delta(
        spark, gen_table,
        predicates=[("ts", ">=", lo), ("ts", "<", hi)],
    )
    # file-level pruning: only the three days' directories are read
    days = {
        seg.split("=", 1)[1].split("/")[0]
        for f in got.inputFiles()
        for seg in f.split("/") if seg.startswith("d=")
    }
    assert days == {"2024-01-03", "2024-01-04", "2024-01-05"}
    want = _events(spark).where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
    )
    assert got.count() == want.count() > 0
    # strict < on an exact midnight boundary excludes that day
    got2 = dr.read_delta(
        spark, gen_table, predicates=[("ts", "<", lo)]
    )
    days2 = {
        seg.split("=", 1)[1].split("/")[0]
        for f in got2.inputFiles()
        for seg in f.split("/") if seg.startswith("d=")
    }
    assert days2 == {"2024-01-01", "2024-01-02"}


def test_append_computes_missing_generated(spark, gen_table):
    dw.append_delta(
        _events(spark).withColumn("id", F.col("id") + 10_000), gen_table
    )
    got = dr.read_delta(spark, gen_table)
    assert got.count() == 800
    assert got.where("d <> CAST(ts AS DATE)").count() == 0


def test_append_validates_supplied_generated(spark, gen_table):
    good = _events(spark, 5).withColumn("d", F.expr("CAST(ts AS DATE)"))
    dw.append_delta(good.withColumn("id", F.col("id") + 20_000),
                    gen_table)
    bad = _events(spark, 5).withColumn(
        "d", F.expr("CAST(ts AS DATE) + INTERVAL 1 DAY").cast("date")
    )
    with pytest.raises(ValueError, match="GENERATED d"):
        dw.append_delta(bad, gen_table)


def test_update_refuses_stale_generated(spark, gen_table):
    with pytest.raises(NotImplementedError, match="generated"):
        dml.update_delta(
            spark, gen_table, "id = 1",
            {"ts": "ts + INTERVAL 1 DAY"},
        )
    with pytest.raises(NotImplementedError, match="generated|partition"):
        dml.update_delta(
            spark, gen_table, "id = 1", {"d": "DATE'2020-01-01'"}
        )
    # assigning an unrelated column is fine; the rewrite re-validates
    v = dml.update_delta(spark, gen_table, "id = 1", {"x": "x + 1"})
    assert v > 0
    # DELETE needs no recompute
    dml.delete_delta(spark, gen_table, "id = 2")
    got = dr.read_delta(spark, gen_table)
    assert got.where("id = 2").count() == 0
    assert got.where("d <> CAST(ts AS DATE)").count() == 0


def test_year_and_month_expressions(spark, tmp_path):
    rows = [
        (i, datetime.datetime(2020 + i % 4, 1 + i % 12, 3)) for i in
        range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    ty = str(tmp_path / "y")
    dw.create_delta(df, ty, partition_by=["y"],
                    generated={"y": "year(ts)"})
    got = dr.read_delta(
        spark, ty,
        predicates=[("ts", ">=", datetime.datetime(2022, 1, 1))],
    )
    years = {
        seg.split("=", 1)[1].split("/")[0]
        for f in got.inputFiles()
        for seg in f.split("/") if seg.startswith("y=")
    }
    assert years == {"2022", "2023"}
    want = {i for i, t in rows if t >= datetime.datetime(2022, 1, 1)}
    assert {r.id for r in got.collect()} == want
    # month: equality prunes, ranges keep everything but stay exact
    tm = str(tmp_path / "m")
    dw.create_delta(df, tm, partition_by=["m"],
                    generated={"m": "month(ts)"})
    got_eq = dr.read_delta(
        spark, tm,
        predicates=[("ts", "==", datetime.datetime(2021, 2, 3))],
    )
    months = {
        seg.split("=", 1)[1].split("/")[0]
        for f in got_eq.inputFiles()
        for seg in f.split("/") if seg.startswith("m=")
    }
    assert months == {"2"}
    got_rng = dr.read_delta(
        spark, tm,
        predicates=[("ts", ">=", datetime.datetime(2022, 6, 1))],
    )
    want_rng = {i for i, t in rows if t >= datetime.datetime(2022, 6, 1)}
    assert {r.id for r in got_rng.collect()} == want_rng


def test_unrecognized_expression_no_prune_still_exact(spark, tmp_path):
    table = str(tmp_path / "u")
    df = spark.createDataFrame(
        [(i, f"w{i % 5}") for i in range(50)], "id long, s string"
    )
    dw.create_delta(
        df, table, partition_by=["u"], generated={"u": "upper(s)"}
    )
    got = dr.read_delta(spark, table, predicates=[("id", "<", 10)])
    assert {r.id for r in got.collect()} == set(range(10))
    # validation still enforced for the unrecognized shape
    bad = df.withColumn("u", F.lit("WRONG"))
    with pytest.raises(ValueError, match="GENERATED u"):
        dw.append_delta(bad, table)


def test_generated_plus_column_mapping_refused(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="column mapping"):
        dw.create_delta(
            _events(spark, 5), str(tmp_path / "gm"),
            generated={"d": "CAST(ts AS DATE)"},
            column_mapping="id",
        )


def test_generated_col_in_input_refused(spark, tmp_path):
    df = _events(spark, 5).withColumn("d", F.expr("CAST(ts AS DATE)"))
    with pytest.raises(ValueError, match="already in the input"):
        dw.create_delta(
            df, str(tmp_path / "gi"),
            generated={"d": "CAST(ts AS DATE)"},
        )
