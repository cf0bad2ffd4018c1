"""Equivalence tests for the skew rewrites (salted agg/join must return
the same multiset as their plain counterparts) and MERGE upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from dst_spark_k8_lakehouse_spark.operators import skew
from dst_spark_k8_lakehouse_spark.plans import VersionedTable
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.n, r.q, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
            F.max("l_quantity").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, r.q, r.hi)
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": (F.count("*"), F.sum),
                "q": (
                    F.sum(F.round(F.col("l_quantity") * 100).cast("long")),
                    F.sum,
                ),
                "hi": (F.max("l_quantity"), F.max),
            },
            salt_source="l_orderkey",
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"), "o_orderkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), "c_name"
    )
    plain = sorted(
        (r.key, r.o_orderkey, r.c_name)
        for r in orders.join(customer, "key").collect()
    )
    salted = sorted(
        (r.key, r.o_orderkey, r.c_name)
        for r in skew.salted_join(orders, customer, "key").collect()
    )
    assert salted == plain


@pytest.fixture()
def target(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.create(
        spark.createDataFrame(
            [Row(id=1, val="a"), Row(id=2, val="b"), Row(id=3, val="c")]
        )
    )
    return t


def test_merge_upsert(spark, target):
    source = spark.createDataFrame(
        [Row(id=2, val="B2"), Row(id=9, val="new")]
    )
    target.merge(source, on=["id"])
    rows = {r.id: r.val for r in target.read().collect()}
    assert rows == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_merge_update_only(spark, target):
    source = spark.createDataFrame([Row(id=3, val="C2"), Row(id=9, val="x")])
    target.merge(source, on=["id"], insert_when_not_matched=False)
    rows = {r.id: r.val for r in target.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "C2"}


def test_merge_insert_only(spark, target):
    source = spark.createDataFrame([Row(id=3, val="C2"), Row(id=9, val="x")])
    target.merge(source, on=["id"], update_when_matched=False)
    rows = {r.id: r.val for r in target.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 9: "x"}


def test_merge_rejects_duplicate_source_keys(spark, target):
    source = spark.createDataFrame([Row(id=2, val="x"), Row(id=2, val="y")])
    with pytest.raises(ValueError, match="duplicate"):
        target.merge(source, on=["id"])


def test_merge_schema_evolution(spark, target):
    """MERGE with a new source column: schema merges, old rows NULL."""
    source = spark.createDataFrame([Row(id=5, val="e", extra=1)])
    target.merge(source, on=["id"])
    df = target.read()
    assert "extra" in df.columns
    assert df.filter("extra IS NULL").count() == 3
