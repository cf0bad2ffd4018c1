"""CHECK constraints on native Delta tables: recorded in the metaData
configuration per the protocol, verified against existing rows at ADD
time, and enforced on every library write path (append, overwrite,
DML rewrites) with the first violating row reported."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def test_add_verifies_existing_rows(spark, tmp_path):
    t = str(tmp_path / "c")
    dw.create_delta(_df(spark, 0, 10), t)
    with pytest.raises(ValueError, match="violated by row"):
        dw.add_check_constraint(spark, t, "pos", "id > 5")
    dw.add_check_constraint(spark, t, "nonneg", "id >= 0")
    state = dr._replay(spark, t, None)
    assert dw.constraints_of(state["metaData"]) == {"nonneg": "id >= 0"}
    assert state["protocol"]["minWriterVersion"] >= 3
    with pytest.raises(ValueError, match="already exists"):
        dw.add_check_constraint(spark, t, "nonneg", "id >= 0")


def test_append_and_overwrite_enforce(spark, tmp_path):
    t = str(tmp_path / "c")
    dw.create_delta(_df(spark, 0, 5), t)
    dw.add_check_constraint(spark, t, "small", "id < 100")
    dw.append_delta(_df(spark, 5, 10), t)  # fine
    with pytest.raises(ValueError, match="small"):
        dw.append_delta(_df(spark, 100, 101), t)
    with pytest.raises(ValueError, match="small"):
        dw.overwrite_delta(_df(spark, 200, 201), t)
    # failed writes committed nothing
    assert {r.id for r in dr.read_delta(spark, t).collect()} \
        == set(range(10))


def test_null_result_violates(spark, tmp_path):
    t = str(tmp_path / "c")
    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    dw.create_delta(df, t)
    dw.add_check_constraint(spark, t, "xpos", "x > 0")
    with pytest.raises(ValueError, match="xpos"):
        dw.append_delta(
            spark.createDataFrame([(2, None)], "id long, x double"), t
        )


def test_update_enforces(spark, tmp_path):
    t = str(tmp_path / "c")
    dw.create_delta(_df(spark, 0, 5), t)
    dw.add_check_constraint(spark, t, "xcap", "x <= 100")
    with pytest.raises(ValueError, match="xcap"):
        dml.update_delta(spark, t, "id = 1", {"x": "999.0"})
    dml.update_delta(spark, t, "id = 1", {"x": "99.0"})
    got = {(r.id, r.x) for r in dr.read_delta(spark, t).collect()}
    assert (1, 99.0) in got


def test_drop_constraint(spark, tmp_path):
    t = str(tmp_path / "c")
    dw.create_delta(_df(spark, 0, 3), t)
    dw.add_check_constraint(spark, t, "cap", "id < 50")
    dw.drop_check_constraint(spark, t, "cap")
    dw.append_delta(_df(spark, 100, 101), t)  # no longer enforced
    assert 100 in {r.id for r in dr.read_delta(spark, t).collect()}
    with pytest.raises(ValueError, match="not on table"):
        dw.drop_check_constraint(spark, t, "cap")


def test_not_null_invariant_enforced(spark, tmp_path):
    from pyspark.sql import types as T

    t = str(tmp_path / "nn")
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.DoubleType(), True),
    ])
    dw.create_delta(
        spark.createDataFrame([(1, 1.0)], schema), t
    )
    dw.append_delta(
        spark.createDataFrame([(2, None)], schema), t
    )  # nullable x: fine
    with pytest.raises(ValueError, match="NOT NULL id"):
        bad = spark.createDataFrame(
            [(None, 3.0)],
            T.StructType([
                T.StructField("id", T.LongType(), True),
                T.StructField("x", T.DoubleType(), True),
            ]),
        )
        dw.append_delta(bad, t)
    assert {r.id for r in dr.read_delta(spark, t).collect()} == {1, 2}
