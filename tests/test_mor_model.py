"""Model-based property tests for the merge-on-read stacks: random
sequences of mutating operations run against BOTH the native table
and a plain in-memory model; after every step the table must read
exactly the model's rows. This is the test shape that catches
ordering/sequence-number bugs no hand-written scenario thinks of
(the r5 lesson: planted/randomized fixtures find what exact-copy
fixtures mask)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw

# op vocabulary: (kind, parameter)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("pos_delete"), st.integers(0, 6)),   # id % k
        st.tuples(st.just("eq_delete"), st.integers(0, 39)),   # one key
        st.tuples(st.just("append"), st.integers(0, 39)),      # one row
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1,
    max_size=5,
)


def _seed_rows():
    return {i: float(i * 2) for i in range(20)}  # id -> x


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_iceberg_mor_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("mor") / "t")
    df = spark.createDataFrame(
        sorted(_seed_rows().items()), "id long, x double"
    )
    iw.create_iceberg(df, table, format_version=2)
    model: dict[int, list[float]] = {
        k: [v] for k, v in _seed_rows().items()
    }
    for kind, p in ops:
        if kind == "pos_delete":
            cond = f"id % 7 = {p}" if p < 7 else "id < 0"
            iceberg_mor.delete_where_mor(spark, table, cond)
            for k in list(model):
                if k % 7 == p:
                    model[k] = []
        elif kind == "eq_delete":
            iceberg_mor.delete_keys_mor(
                spark, table,
                spark.createDataFrame([(p,)], "id long"),
            )
            model[p] = []
        elif kind == "append":
            iw.append_iceberg(
                spark.createDataFrame(
                    [(p, float(p * 2 + 1))], "id long, x double"
                ),
                table,
            )
            model.setdefault(p, []).append(float(p * 2 + 1))
        elif kind == "compact":
            iceberg_mor.compact_mor(spark, table)
        got = sorted(
            (r.id, r.x)
            for r in ir.read_iceberg(spark, table).collect()
        )
        want = sorted(
            (k, v) for k, vals in model.items() for v in vals
        )
        assert got == want, (kind, p, ops)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_delta_dv_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("dv") / "t")
    df = spark.createDataFrame(
        sorted(_seed_rows().items()), "id long, x double"
    ).repartition(2)
    dw.create_delta(df, table)
    model: dict[int, list[float]] = {
        k: [v] for k, v in _seed_rows().items()
    }
    for kind, p in ops:
        if kind == "pos_delete":
            cond = f"id % 7 = {p}" if p < 7 else "id < 0"
            delta_dv.delete_where_dv(spark, table, cond)
            for k in list(model):
                if k % 7 == p:
                    model[k] = []
        elif kind == "eq_delete":
            # delta has no equality deletes; express by key condition
            delta_dv.delete_where_dv(spark, table, f"id = {p}")
            model[p] = []
        elif kind == "append":
            dw.append_delta(
                spark.createDataFrame(
                    [(p, float(p * 2 + 1))], "id long, x double"
                ),
                table,
            )
            model.setdefault(p, []).append(float(p * 2 + 1))
        elif kind == "compact":
            delta_dv.materialize_dvs(spark, table)
        got = sorted(
            (r.id, r.x)
            for r in dr.read_delta(spark, table).collect()
        )
        want = sorted(
            (k, v) for k, vals in model.items() for v in vals
        )
        assert got == want, (kind, p, ops)
