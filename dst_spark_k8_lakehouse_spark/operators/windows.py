"""Window functions (SURVEY.md §2.6).

Not exercised by the reference (no ``Window`` import anywhere in its
first-party code) — platform capability rows, all Spark built-ins.

Determinism discipline: every window that feeds ``row_number``/``lag``/
running sums orders by a UNIQUE key (or a key + unique tiebreaker) so
the result is a pure function of the data. At scale a window shuffles
once on its partition key then sorts within partitions — same cost
envelope as a group-by with a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "w1_rank",
    oracle="""
        SELECT c_custkey, c_nationkey, c_mktsegment,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey)
                   AS rn,
               rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment)
                   AS seg_rank,
               dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment)
                   AS seg_dense_rank
        FROM customer
    """,
)
def w1_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number (unique order key → deterministic) + rank /
    dense_rank (tie-stable by definition)."""
    customer = load_table(spark, sf_dir, "customer")
    by_key = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    by_seg = Window.partitionBy("c_nationkey").orderBy("c_mktsegment")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.row_number().over(by_key).alias("rn"),
        F.rank().over(by_seg).alias("seg_rank"),
        F.dense_rank().over(by_seg).alias("seg_dense_rank"),
    )


@query(
    "w2_lag",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               lag(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
               lead(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
        FROM orders
    """,
)
def w2_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead over a per-customer order sequence."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "w3_running_sum",
    oracle="""
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_spend
        FROM orders
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: frame-spec running aggregate — identical sequential summation
    order on both engines, rounded anyway."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "w4_topk_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER
            (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def w4_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-k per group — row_number ≤ k with a unique tiebreaker.
    At scale this is the partition-local-sort pattern: no global sort,
    one shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
