"""Sorts / limits / top-k (SURVEY.md §2.7).

Reference evidence: ``modules/dst_metrics/demo.py:219,236``
(``orderBy(col(...).desc())``), ``05_datahub_lineage_demo.ipynb:196``
(``orderBy(F.desc(...))``), ``02_iceberg_demo.ipynb:155``
(``ORDER BY … ASC LIMIT 1``).

Scale note: sort+limit compiles to ``TakeOrderedAndProject`` — each
partition keeps a k-row heap, only k rows per partition reach the
driver-side merge. A global total sort only happens for o1 (full
ordered output), which at 100 TB is a range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "o1_sort",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer ORDER BY c_acctbal DESC
    """,
)
def o1_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: descending sort (hash check is order-insensitive; the sort
    itself is asserted in unit tests)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"))
    )


@query(
    "o2_sort_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def o2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3: sort + limit (top-k) with a unique tiebreaker so the
    selected row set is deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )
