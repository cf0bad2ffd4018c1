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


_CDF_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("update"), st.integers(0, 4),
                  st.integers(0, 99)),          # id % 5 == k → x = c
        st.tuples(st.just("delete"), st.integers(0, 6),
                  st.just(0)),                  # id % 7 == k
        st.tuples(st.just("append"), st.integers(1, 3),
                  st.integers(0, 99)),          # n new rows, x = c
    ),
    min_size=1,
    max_size=4,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_CDF_OPS)
def test_change_feed_folds_to_current_state(
    spark, tmp_path_factory, ops
):
    """THE CDC invariant: replaying the change feed over the initial
    snapshot must reproduce the current table exactly, for any DML
    sequence — the property every downstream sync (x5_cdc_pipeline)
    relies on."""
    from dst_spark_k8_lakehouse_spark.plans import delta_cdf
    from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml

    table = str(tmp_path_factory.mktemp("cdf") / "t")
    dw.create_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, x double"
        ).repartition(2),
        table,
    )
    delta_cdf.enable_cdf(spark, table)
    next_id = 100
    for kind, k, c in ops:
        if kind == "update":
            dml.update_delta(
                spark, table, f"id % 5 = {k}", {"x": f"{c}.0"}
            )
        elif kind == "delete":
            dml.delete_delta(spark, table, f"id % 7 = {k}")
        else:
            dw.append_delta(
                spark.createDataFrame(
                    [(next_id + j, float(c)) for j in range(k)],
                    "id long, x double",
                ),
                table,
            )
            next_id += k
    # fold the feed over the v0 snapshot (ids are unique by
    # construction, so per-version keyed application is exact)
    state = {
        r.id: r.x
        for r in dr.read_delta(spark, table, version=0).collect()
    }
    feed = delta_cdf.read_change_feed(spark, table, 1).collect()
    by_version: dict[int, list] = {}
    for r in feed:
        by_version.setdefault(r._commit_version, []).append(r)
    for v in sorted(by_version):
        rows = by_version[v]
        for r in rows:
            if r._change_type == "delete":
                del state[r.id]
        for r in rows:
            if r._change_type in ("update_postimage", "insert"):
                state[r.id] = r.x
    got = sorted(
        (r.id, r.x) for r in dr.read_delta(spark, table).collect()
    )
    assert got == sorted(state.items()), ops
