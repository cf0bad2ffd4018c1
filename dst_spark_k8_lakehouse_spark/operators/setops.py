"""Set operations (SURVEY.md §2.8) — platform capability rows (the
reference never calls them; pure Spark built-ins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "u1_union",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment = 'MACHINERY'
    """,
)
def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union (bag semantics, like SQL UNION ALL) via unionByName."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING")
    machinery = customer.filter(F.col("c_mktsegment") == "MACHINERY")
    return building.unionByName(machinery)


@query(
    "u2_intersect",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: intersect (distinct semantics) — BUILDING customers that have
    a finished order."""
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    finished = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(finished)


@query(
    "u3_except",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: except (distinct semantics, ``subtract``) — BUILDING customers
    with no finished order."""
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    finished = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.subtract(finished)
