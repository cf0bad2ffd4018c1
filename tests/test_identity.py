"""Delta IDENTITY COLUMNS (spec ``identityColumns`` writer feature):
writer-generated LONG values on the ``start + k·step`` lattice from a
per-field high-water mark. Contracts: lattice + uniqueness (NOT
density — the per-task block allocation admits gaps, as the spec
allows), watermark advancement from footer stats, GENERATED ALWAYS
refusal vs BY DEFAULT acceptance, DML refusals, protocol feature, and
the CREATE TABLE / INSERT statement faces.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml
from dst_spark_k8_lakehouse_spark.plans import delta_identity as di
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import dml


def _mk(spark, tmp_path, start=100, step=3, always=True, name="t"):
    table = str(tmp_path / name)
    df = spark.range(5).select(F.col("id").alias("k")).coalesce(1)
    dw.create_delta(
        df, table,
        identity={"rid": {"start": start, "step": step,
                          "always": always}},
    )
    return table


def _ids(spark, table):
    return [r.rid for r in dr.read_delta(spark, table).collect()]


def _hwm(spark, table):
    meta = dr._replay(spark, table, None)["metaData"]
    return di.identity_specs(meta)["rid"]["hwm"]


def test_create_assigns_on_lattice_and_sets_hwm(spark, tmp_path):
    table = _mk(spark, tmp_path)
    ids = _ids(spark, table)
    assert len(ids) == len(set(ids)) == 5
    assert all((i - 100) % 3 == 0 for i in ids)
    assert min(ids) == 100  # first free value = start
    # single input partition -> dense: 100,103,...,112
    assert sorted(ids) == [100, 103, 106, 109, 112]
    assert _hwm(spark, table) == max(ids)
    # non-nullable by contract
    meta = dr._replay(spark, table, None)["metaData"]
    f = next(
        f for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "rid"
    )
    assert f["nullable"] is False and f["type"] == "long"


def test_append_advances_watermark_disjointly(spark, tmp_path):
    table = _mk(spark, tmp_path)
    hwm0 = _hwm(spark, table)
    dw.append_delta(
        spark.range(5, 12).select(F.col("id").alias("k")), table
    )
    ids = _ids(spark, table)
    assert len(ids) == len(set(ids)) == 12
    assert all((i - 100) % 3 == 0 for i in ids)
    new = [i for i in ids if i > hwm0]
    assert len(new) == 7  # every appended row drew ABOVE the old hwm
    assert _hwm(spark, table) == max(ids)


def test_generated_always_refuses_explicit(spark, tmp_path):
    table = _mk(spark, tmp_path, always=True)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        dw.append_delta(
            spark.createDataFrame([(99, 999)], "k long, rid long"),
            table,
        )


def test_by_default_accepts_and_bumps_past_explicit(spark, tmp_path):
    table = _mk(spark, tmp_path, always=False)
    dw.append_delta(
        spark.createDataFrame([(50, 10_000)], "k long, rid long"),
        table,
    )
    assert _hwm(spark, table) == 10_000
    dw.append_delta(
        spark.range(60, 62).select(F.col("id").alias("k")), table
    )
    ids = _ids(spark, table)
    assert len(ids) == len(set(ids)) == 8
    gen_after = [i for i in ids if i > 10_000]
    assert len(gen_after) == 2  # generation resumed past the explicit


def test_by_default_low_explicit_never_regresses_hwm(spark, tmp_path):
    table = _mk(spark, tmp_path, always=False)
    hwm0 = _hwm(spark, table)
    dw.append_delta(
        spark.createDataFrame([(51, 1)], "k long, rid long"), table
    )
    assert _hwm(spark, table) == hwm0  # 1 < hwm: watermark holds


def test_negative_step_descends(spark, tmp_path):
    table = _mk(spark, tmp_path, start=0, step=-2)
    dw.append_delta(
        spark.range(5, 8).select(F.col("id").alias("k")), table
    )
    ids = _ids(spark, table)
    assert len(ids) == len(set(ids)) == 8
    assert all(i <= 0 and i % 2 == 0 for i in ids)
    assert _hwm(spark, table) == min(ids)  # low-water for step < 0


def test_dml_refusals_and_delete_ok(spark, tmp_path):
    table = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="identity"):
        delta_dml.update_delta(spark, table, "k = 1", {"rid": "0"})
    with pytest.raises(NotImplementedError, match="identity"):
        delta_dml.merge_delta(
            spark, table,
            spark.createDataFrame([(1, 100)], "k long, rid long"),
            on=["k"],
        )
    delta_dml.delete_delta(spark, table, "k = 0")
    assert len(_ids(spark, table)) == 4


def test_protocol_and_overwrite(spark, tmp_path):
    table = _mk(spark, tmp_path)
    p = dr._replay(spark, table, None)["protocol"]
    assert p["minWriterVersion"] == 7
    assert "identityColumns" in p["writerFeatures"]
    hwm0 = _hwm(spark, table)
    dw.overwrite_delta(
        spark.range(3).select(F.col("id").alias("k")), table
    )
    ids = _ids(spark, table)
    assert len(ids) == len(set(ids)) == 3
    # the watermark NEVER regresses — overwritten history keeps its
    # id range reserved (time travel still shows those rows)
    assert all(i > hwm0 for i in ids)
    assert _hwm(spark, table) == max(ids)


def test_statement_faces(spark, tmp_path):
    table = str(tmp_path / "s")
    tables = {"t": table}
    dml.execute_native_sql(
        spark,
        "CREATE TABLE t (rid BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 5 INCREMENT BY 2), name STRING) USING delta",
        tables,
    )
    dml.execute_native_sql(
        spark, "INSERT INTO t VALUES ('a'), ('b')", tables
    )
    rows = dr.read_delta(spark, table).collect()
    assert sorted(r.rid for r in rows) == [5, 7]
    assert {r.name for r in rows} == {"a", "b"}
    # full-arity INSERT on a GENERATED ALWAYS table refuses
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        dml.execute_native_sql(
            spark, "INSERT INTO t VALUES (99, 'c')", tables
        )
    # Iceberg: no identity columns
    with pytest.raises(NotImplementedError, match="Iceberg"):
        dml.execute_native_sql(
            spark,
            "CREATE TABLE i (rid BIGINT GENERATED ALWAYS AS IDENTITY)"
            " USING iceberg",
            {"i": str(tmp_path / "i")},
        )


def test_identity_with_defaults_composes(spark, tmp_path):
    """An identity column and a CURRENT_DEFAULT column on one table:
    a write omitting BOTH gets ids generated and the default filled."""
    table = str(tmp_path / "c")
    dw.create_delta(
        spark.range(2).select(F.col("id").alias("k")).coalesce(1),
        table,
        identity={"rid": {"start": 1, "step": 1, "always": True}},
    )
    dw.add_column(spark, table, "src", "string")
    dw.set_column_default(spark, table, "src", "'etl'")
    dw.append_delta(
        spark.createDataFrame([(7,)], "k long").coalesce(1), table
    )
    rows = {r.k: r for r in dr.read_delta(spark, table).collect()}
    assert rows[7].src == "etl" and rows[7].rid == 3
    ids = [r.rid for r in rows.values()]
    assert len(ids) == len(set(ids)) == 3


def test_identity_lattice_fuzz(spark, tmp_path):
    """Randomized start/step/batch shapes: across every append the
    allocation stays unique, on the lattice, watermark-tracked, and
    count-exact. (Plain loop over seeded cases, not @given — each
    case costs Spark jobs; 8 cases × 3 appends is the budget.)"""
    import random

    rng = random.Random(20260816)
    for case in range(8):
        start = rng.randint(-1000, 1000)
        step = rng.choice([-7, -2, -1, 1, 2, 3, 11])
        table = str(tmp_path / f"f{case}")
        dw.create_delta(
            spark.range(rng.randint(1, 5)).select(
                F.col("id").alias("k")
            ).coalesce(1),
            table,
            identity={"rid": {"start": start, "step": step,
                              "always": True}},
        )
        n_total = None
        for b in range(2):
            n = rng.randint(1, 6)
            parts = rng.choice([1, 2, 3])
            dw.append_delta(
                spark.range(100 * (b + 1), 100 * (b + 1) + n)
                .select(F.col("id").alias("k"))
                .repartition(parts),
                table,
            )
        rows = dr.read_delta(spark, table).collect()
        ids = [r.rid for r in rows]
        assert len(ids) == len(set(ids)), (case, start, step)
        assert all((i - start) % step == 0 for i in ids), (
            case, start, step,
        )
        hwm = di.identity_specs(
            dr._replay(spark, table, None)["metaData"]
        )["rid"]["hwm"]
        assert hwm == (max(ids) if step > 0 else min(ids))
