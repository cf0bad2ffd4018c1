#!/usr/bin/env python
"""Batch job: revenue-by-nation report with pipeline metrics.

The engine's analog of the reference's Spark-Operator entry point
(``k8s/spark-apps/pyspark-example.yaml:1-26``: a ``SparkApplication`` CR
pointing at a Python main under ``/opt/workdir/jobs/``) — a plain
``spark-submit``-able script. On a cluster::

    spark-submit --master k8s://... --py-files dst_spark_k8_lakehouse_spark.zip \
        jobs/revenue_report.py --sf-dir s3a://bucket/data --out s3a://bucket/gold

Locally::

    python jobs/revenue_report.py --sf-dir /root/testdata/sf0.01 --out /tmp/gold

Structure mirrors the reference's metrics demo job
(``modules/dst_metrics/demo.py``): work wrapped in a metric context, row
counts logged per layer, completion event with duration/status on exit.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dst_spark_k8_lakehouse_spark import get_session  # noqa: E402
from dst_spark_k8_lakehouse_spark.metrics import MetricContext  # noqa: E402
from dst_spark_k8_lakehouse_spark.operators.joins import (  # noqa: E402
    revenue_by_nation,
)
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table  # noqa: E402


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Build the gold-layer revenue report; returns rows written."""
    with MetricContext(
        spark,
        layer=3,
        project="revenue",
        dataset_year=2024,
        description="revenue by nation",
        job_name="revenue_report",
        table_path=f"{out_dir}/_activity_log",
    ) as ctx:
        report = revenue_by_nation(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "nation"),
            load_table(spark, sf_dir, "region"),
        )
        report.write.mode("overwrite").parquet(f"{out_dir}/revenue_by_nation")
        n = spark.read.parquet(f"{out_dir}/revenue_by_nation").count()
        ctx.log_metric(
            layer=3,
            project="revenue",
            dataset_year=2024,
            description="gold rows written",
            value=n,
            unit="rows",
            function="count",
            table_name="revenue_by_nation",
            source_path=sf_dir,
        )
    return n


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    spark = get_session(app_name="revenue-report")
    n = run(spark, args.sf_dir, args.out)
    print(f"wrote {n} rows to {args.out}/revenue_by_nation")


if __name__ == "__main__":
    main()
