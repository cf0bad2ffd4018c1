"""Scan/sink operator queries (SURVEY.md §2.1).

Reference evidence: parquet staging ``modules/dst_metrics/python_logger.py:
10-14``; CSV read/write ``modules/dst_metrics/demo.py:52-54,88``; append
sink with mergeSchema ``modules/dst_metrics/spark_logger.py:55-57``;
``spark.range`` ``demo.py:52,57``.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "s1_parquet_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s1_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: plain parquet scan — the base access path for every table."""
    return load_table(spark, sf_dir, "region")


@query(
    "s2_csv_roundtrip",
    oracle="""
        SELECT count(*) AS n_back, count(*) AS n_src FROM nation
    """,
)
def s2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3: CSV sink with header then CSV scan with explicit schema.

    Reference reads CSV with header and later casts stringly columns
    (``demo.py:88,122``); we read back with an explicit schema instead
    (the survey's 'avoid inference' posture, ``spark_logger.py:14``).
    The roundtrip result is deterministic — both counts must equal the
    source cardinality — so since r4 the oracle pins it instead of a
    rows-only run.
    """
    out = tempfile.mkdtemp(prefix="s2_csv_")
    try:
        nation = load_table(spark, sf_dir, "nation")
        nation.write.mode("overwrite").option("header", True).csv(out)
        back = (
            spark.read.option("header", True)
            .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
            .csv(out)
        )
        from dst_spark_k8_lakehouse_spark.localrel import local_frame

        return local_frame(
            spark, [(back.count(), nation.count())],
            "n_back BIGINT, n_src BIGINT",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "s5_append_sink",
    oracle="SELECT 2 * count(*) AS n_appended FROM region",
)
def s5_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: append-mode lakehouse sink (``spark_logger.py:55-57``) —
    two appends of the same 5-row table double the row count; the
    doubled count is deterministic, so the oracle pins it (r4)."""
    out = tempfile.mkdtemp(prefix="s5_append_")
    try:
        region = load_table(spark, sf_dir, "region")
        region.write.mode("overwrite").parquet(out)
        region.write.mode("append").parquet(out)
        from dst_spark_k8_lakehouse_spark.localrel import local_frame

        return local_frame(
            spark, [(spark.read.parquet(out).count(),)],
            "n_appended BIGINT",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "s8_range",
    oracle="SELECT range AS id, range * 100 AS amount FROM range(10)",
)
def s8_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: range generator source (``demo.py:52,57`` builds demo customers
    and orders from ``spark.range(10)`` + selectExpr)."""
    return spark.range(10).select(
        F.col("id"), (F.col("id") * 100).alias("amount")
    )


def jdbc_table_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S13: JDBC source wiring — the standard Spark surface the
    reference would use against an external database. No NETWORK
    database exists in this container, but Spark's bundled embedded
    Derby jars make a LIVE in-process round-trip testable
    (``s13_jdbc_roundtrip`` below writes and reads through real JDBC);
    the parameters encode the two things that matter at scale:

    - ``partition_column``/bounds/``num_partitions``: without them the
      whole table streams through ONE task; with them Spark issues
      ``num_partitions`` bounded range queries in parallel.
    - predicate pushdown is on by default (``pushDownPredicate``) so
      ``.filter`` on the result compiles into the remote WHERE clause.
    """
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(Spark issues numPartitions bounded range queries)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@query(
    "s13_jdbc_roundtrip",
    oracle="""
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
        FROM customer WHERE c_custkey <= 500
    """,
)
def s13_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 LIVE: a real JDBC round-trip through the embedded Derby
    database Spark bundles (``jars/derby-*.jar`` ship with every Spark
    distribution for the Hive metastore) — ``df.write.jdbc`` creates
    the table and inserts, ``jdbc_table_source`` reads it back as a
    PARTITIONED parallel scan (4 bounded range queries on
    ``c_custkey``). This upgrades the S13 JDBC surface from API wiring
    to an executed, value-checked path; a production deployment swaps
    the URL + driver for its network database, everything else is the
    same call (embedded in-memory Derby is per-JVM, which is exactly
    the local[...] test story).

    The predicate in the query text pushes into the remote WHERE
    clause (``pushDownPredicate`` default) — plan-asserted in
    ``test_jdbc_roundtrip_pushdown``."""
    import uuid as _uuid

    url = f"jdbc:derby:memory:s13db{_uuid.uuid4().hex};create=true"
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    (
        cust.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "cust")
        .option("driver", _DERBY_DRIVER)
        .save()
    )
    back = jdbc_table_source(
        spark,
        url,
        "cust",
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=501,
        num_partitions=4,
        driver=_DERBY_DRIVER,
    )
    return back.select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
