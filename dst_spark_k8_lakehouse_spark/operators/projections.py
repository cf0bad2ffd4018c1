"""Projections / filters / scalar expressions (SURVEY.md §2.3).

Reference evidence: ``modules/dst_metrics/demo.py:52-58,122,137-139,
217-218,231-235``, ``modules/dst_metrics/utils.py:20``,
``06_pipeline_metrics_demo.ipynb:224-265``. All pure built-ins —
Catalyst pushes these filters/projections into the parquet scan
(verified via ``.explain``: PushedFilters / ReadSchema), which is the
whole 100 TB story for this family: scan only what the query touches.

The testdata has no NULLs, so the NULL-handling operators (P5/P6/P11)
manufacture them with ``nullif`` — same technique on both the Spark and
oracle side, so the check stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "p1_project",
    oracle="SELECT c_custkey AS custkey, c_name AS name FROM customer",
)
def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P9: column projection + rename (``demo.py:218,235``)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "custkey")
        .withColumnRenamed("c_name", "name")
    )


@query(
    "p2_selectexpr",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice * 100, 2) AS amount_cents,
               'order_' || CAST(o_orderkey AS VARCHAR) AS order_tag
        FROM orders
    """,
)
def p2_selectexpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: SQL-expression projection (``demo.py:52-53,57-58`` —
    ``"id as customer_id"``, ``"id*100 as amount"``, ``'order_' || id``)."""
    return load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "round(o_totalprice * 100, 2) AS amount_cents",
        "concat('order_', CAST(o_orderkey AS STRING)) AS order_tag",
    )


@query(
    "p3_filter_eq",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE o_orderstatus = 'F'
    """,
)
def p3_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: equality filter (``demo.py:217``; pushed to the parquet scan)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@query(
    "p4_filter_and",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25
    """,
)
def p4_filter_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: conjunctive predicate (``demo.py:231-233``)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "p5_null_filter",
    oracle="""
        SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
        FROM orders WHERE nullif(o_orderstatus, 'O') IS NULL
    """,
)
def p5_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: isNull predicate (``06_…ipynb:226``); NULLs manufactured via
    ``nullif`` since the testdata is null-free."""
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("nullif(o_orderstatus, 'O')").alias("status_or_null"),
    )
    return df.filter(F.col("status_or_null").isNull())


@query(
    "p6_when",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'large'
                    WHEN o_totalprice > 100000 THEN 'medium'
                    ELSE 'small' END AS size_class,
               FALSE AS is_error
        FROM orders
    """,
)
def p6_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: when/otherwise conditional (``06_…ipynb:226``) + literal
    column (``demo.py:137-139`` ``lit(False)`` is_error flag)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.lit(False).alias("is_error"),
    )


@query(
    "p8_cast",
    oracle="""
        SELECT l_orderkey,
               CAST(l_quantity AS INT) AS qty_int,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date
        FROM lineitem
    """,
)
def p8_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P10: cast (``demo.py:122`` ``cast("double")``) via withColumn."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("qty_int", F.col("l_quantity").cast("int"))
        .withColumn("key_str", F.col("l_orderkey").cast("string"))
        .withColumn(
            # day-truncate, but emit TIMESTAMP: a DATE column round-trips
            # as datetime.date from Spark vs datetime64 from DuckDB and
            # the driver's stringified value-hash would diverge.
            "ship_date",
            F.col("l_shipdate").cast("date").cast("timestamp"),
        )
        .select("l_orderkey", "qty_int", "key_str", "ship_date")
    )


@query(
    "p11_fillna",
    oracle="""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS segment,
               round(coalesce(nullif(c_acctbal, 0.0), 0.0), 2) AS acctbal
        FROM customer
    """,
)
def p11_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: per-column null defaults (``06_…ipynb:265`` ``fillna({…})``)."""
    df = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("segment"),
        F.expr("nullif(c_acctbal, 0.0)").alias("acctbal"),
    )
    return df.fillna({"segment": "UNKNOWN", "acctbal": 0.0}).withColumn(
        "acctbal", F.round("acctbal", 2)
    )


@query(
    "p12_dedup_rows",
    oracle="SELECT count(DISTINCT c_nationkey) AS n_keys FROM customer",
)
def p12_dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: dropDuplicates on a key subset (``06_…ipynb:246,264``).

    Which row survives is nondeterministic, so the oracle checks the
    deterministic invariant: surviving row count == distinct key count
    (SURVEY §2.3 P12 note).
    """
    return (
        load_table(spark, sf_dir, "customer")
        .dropDuplicates(["c_nationkey"])
        .agg(F.count("*").alias("n_keys"))
    )


@query(
    "p13_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def p13_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: full-row distinct."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
    )


@query(
    "p14_concat",
    oracle="""
        SELECT concat('order_', CAST(o_orderkey AS VARCHAR)) AS order_tag,
               concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio
        FROM orders
    """,
)
def p14_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: string concatenation (``demo.py:58`` ``'order_' || id``)."""
    return load_table(spark, sf_dir, "orders").select(
        F.concat(F.lit("order_"), F.col("o_orderkey").cast("string")).alias(
            "order_tag"
        ),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias(
            "status_prio"
        ),
    )
