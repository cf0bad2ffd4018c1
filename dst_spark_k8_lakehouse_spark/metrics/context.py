"""Metric context manager — reference ``modules/dst_metrics/context.py:
18-53`` semantics: one run_id for the whole block, user metrics logged
through it, and on exit a synthetic ``completion`` event carrying
wall-clock ``duration_ms`` and success/failure status derived from the
exception state (exceptions are never suppressed). Difference by
design: events flush as one batch at exit instead of one commit each."""

from __future__ import annotations

import time
import uuid
from typing import Any

from pyspark.sql import SparkSession

from dst_spark_k8_lakehouse_spark.metrics.logger import MetricsLogger


class MetricContext:
    def __init__(
        self,
        spark: SparkSession,
        layer: Any,
        project: str,
        dataset_year: int,
        description: str,
        job_name: str | None = None,
        table_path: str | None = None,
        logger: MetricsLogger | None = None,
    ):
        self.layer = layer
        self.project = project
        self.dataset_year = dataset_year
        self.description = description
        self.job_name = job_name
        self.run_id = str(uuid.uuid4())  # shared by every event in the block
        self.logger = logger or MetricsLogger(spark, table_path=table_path)

    def __enter__(self) -> "MetricContext":
        self._start = time.time()
        return self

    def log_metric(self, **kwargs: Any) -> str:
        kwargs.setdefault("run_id", self.run_id)
        return self.logger.log_metric(**kwargs)

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.log_metric(
            layer=self.layer,
            project=self.project,
            dataset_year=self.dataset_year,
            description=self.description,
            value=1,
            unit="job",
            function="completion",
            job_name=self.job_name,
            extra={},
            status="success" if exc_type is None else "failure",
            duration_ms=int((time.time() - self._start) * 1000),
        )
        if exc_type is None:
            self.logger.flush()
        else:
            # exceptional unwind: the flush is a Spark write, and if the
            # block failed because the session/cluster died, that write
            # raises too — which would REPLACE the original exception
            # with the metrics failure and lose the root cause. Metrics
            # are best-effort on the failure path; the job error wins.
            try:
                self.logger.flush()
            except Exception:  # noqa: BLE001
                pass
        return False  # never suppress (reference context.py:53)
