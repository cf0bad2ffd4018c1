"""Testdata catalog: parquet tables as the engine's table layer.

The reference resolves tables through a Polaris REST catalog / Delta paths
(``docker/spark-notebook/connector.py:108-124``,
``getting_started.py:130-151``); locally the same surface is a directory of
parquet files registered as session-catalog views
(``spark.table(name)`` then works exactly like the reference's
``spark.table("polaris.demo.customers")``, ``05_datahub_lineage_demo
.ipynb:147``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (S1): columnar, predicate-pushdown + column-pruning
    capable — filters/projections applied downstream reach the reader.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as a raw nanos LONG
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a microsecond
    TIMESTAMP with exact integer division (a float division would lose
    precision — epoch-nanos exceed a double's 53-bit mantissa).
    Sub-microsecond residue is dropped; queries that emit event
    timestamps truncate to seconds on both engine and oracle sides.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (catalog-scan surface,
    S9/D2/D3: ``spark.table``, SHOW TABLES, DESCRIBE all work)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
