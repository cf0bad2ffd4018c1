#!/usr/bin/env python
"""Batch job: stats-driven gold-layer star report (r12, VERDICT r11
item 8 — the CBO consumer in a user-facing flow).

The reference's users get join planning implicitly from a
catalog-backed Catalyst; this engine's jar-free native tables carry
their statistics in sidecars (Delta ``.crc``, Iceberg snapshot
summaries + Puffin NDV), so the job plans the same way through
``cbo.plan_star_join`` — ONE call that profiles every table from
metadata, orders the star greedily (most selective dimension first),
and lands the broadcast hints the profiles justify. No hand-wired
``F.broadcast``, no reliance on Spark's scan-size guess (which sees a
jar-free table as an unsized parquet union).

Flow: bronze parquet → silver native Iceberg tables with published
statistics (one-time bootstrap, skipped when present) → gold revenue
report via the planned star join. On a cluster::

    spark-submit --master k8s://... --py-files dst_spark_k8_lakehouse_spark.zip \
        jobs/gold_star_report.py --sf-dir s3a://bucket/data --out s3a://bucket/gold

Locally::

    python jobs/gold_star_report.py --sf-dir /root/testdata/sf0.01 --out /tmp/gold
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dst_spark_k8_lakehouse_spark import get_session  # noqa: E402
from dst_spark_k8_lakehouse_spark.metrics import MetricContext  # noqa: E402
from dst_spark_k8_lakehouse_spark.plans import cbo, iceberg_writer  # noqa: E402
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table  # noqa: E402


def bootstrap_silver(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """One-time silver layer: native Iceberg fact + dims with Puffin
    statistics published — the metadata plan_star_join consumes.
    Idempotent: existing tables are reused (steady-state runs plan
    straight from the sidecars)."""
    tables = {
        "fact": (
            "lineitem",
            lambda df: df.select(
                F.col("l_orderkey").alias("o_orderkey"),
                F.col("l_suppkey").alias("s_suppkey"),
                "l_extendedprice",
                "l_discount",
            ),
        ),
        "orders_dim": (
            "orders",
            lambda df: df.where("o_orderpriority = '1-URGENT'").select(
                "o_orderkey", "o_orderdate"
            ),
        ),
        "supplier_dim": (
            "supplier",
            lambda df: df.select("s_suppkey", "s_nationkey"),
        ),
    }
    paths = {}
    for name, (src, shape) in tables.items():
        path = os.path.join(out_dir, "silver", name)
        paths[name] = path
        if os.path.isdir(os.path.join(path, "metadata")):
            continue  # bootstrap already ran
        iceberg_writer.create_iceberg(
            shape(load_table(spark, sf_dir, src)), path
        )
        iceberg_writer.write_table_statistics(spark, path, k=4096)
    return paths


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Plan and run the gold star join; returns rows written."""
    with MetricContext(
        spark,
        layer=3,
        project="gold-star",
        dataset_year=2024,
        description="stats-planned revenue by nation/date",
        job_name="gold_star_report",
        table_path=f"{out_dir}/_activity_log",
    ) as ctx:
        silver = bootstrap_silver(spark, sf_dir, out_dir)
        joined, plan = cbo.plan_star_join(
            spark,
            silver["fact"],
            [
                (silver["orders_dim"], ["o_orderkey"]),
                (silver["supplier_dim"], ["s_suppkey"]),
            ],
        )
        for line in plan["reasons"]:  # the narrated decision, logged
            print(f"[cbo] {line}")
        gold = joined.groupBy("s_nationkey", "o_orderdate").agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
        dest = f"{out_dir}/gold_star_revenue"
        gold.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        ctx.log_metric(
            layer=3,
            project="gold-star",
            dataset_year=2024,
            description="gold rows written",
            value=n,
            unit="rows",
            function="count",
            table_name="gold_star_revenue",
            source_path=sf_dir,
        )
    return n


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    spark = get_session(app_name="gold-star-report")
    n = run(spark, args.sf_dir, args.out)
    print(f"wrote {n} rows to {args.out}/gold_star_revenue")


if __name__ == "__main__":
    main()
