"""Property-based tests (hypothesis) for the cross-engine-exact
aggregation layer: for ANY list of 2-decimal values, the Spark cents
aggregation and the DuckDB SQL template must return bit-identical
doubles, and results must be invariant to partitioning (the property
double sums famously violate)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from dst_spark_k8_lakehouse_spark.exact import (
    avg_sql,
    exact_avg,
    exact_sum,
    revenue,
    revenue_sql,
    sum_sql,
)

# 2-decimal money values, positive and negative, up to 1e7 magnitude
money = st.integers(min_value=-(10**9), max_value=10**9).map(
    lambda c: c / 100
)
# discounts: 0.00 .. 0.99
discount = st.integers(min_value=0, max_value=99).map(lambda c: c / 100)


@settings(max_examples=20, deadline=None)
@given(st.lists(money, min_size=1, max_size=40), st.integers(1, 8))
def test_sum_matches_duckdb_and_partitioning(spark, values, n_parts):
    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(
        n_parts
    )
    got = df.agg(exact_sum("x").alias("s")).collect()[0].s
    expected = (
        duckdb.sql(
            f"SELECT {sum_sql('x')} AS s FROM (SELECT unnest({values}) AS x)"
        )
        .fetchone()[0]
    )
    assert got == expected  # bit-identical, not approx


@settings(max_examples=20, deadline=None)
@given(st.lists(money, min_size=1, max_size=40))
def test_avg_matches_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(exact_avg("x", round_to=4).alias("a")).collect()[0].a
    expected = (
        duckdb.sql(
            f"SELECT {avg_sql('x', round_to=4)} AS a "
            f"FROM (SELECT unnest({values}) AS x)"
        )
        .fetchone()[0]
    )
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(money, discount), min_size=1, max_size=30),
    st.integers(1, 8),
)
def test_revenue_matches_duckdb(spark, rows, n_parts):
    df = spark.createDataFrame(rows, "p double, d double").repartition(n_parts)
    got = df.agg(revenue("p", "d").alias("r")).collect()[0].r
    ps = [r[0] for r in rows]
    ds = [r[1] for r in rows]
    expected = (
        duckdb.sql(
            f"SELECT {revenue_sql('p', 'd')} AS r FROM "
            f"(SELECT unnest({ps}) AS p, unnest({ds}) AS d)"
        )
        .fetchone()[0]
    )
    assert got == expected
