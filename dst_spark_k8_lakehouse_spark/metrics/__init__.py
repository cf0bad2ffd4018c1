"""Pipeline-metrics module (SURVEY §7.5) — the engine's re-design of the
reference's first-party ``dst_metrics`` package: an append-only metrics
event log with a context-manager API, plus the medallion-pipeline
helpers its demo exercises."""

from dst_spark_k8_lakehouse_spark.metrics.context import MetricContext  # noqa: F401
from dst_spark_k8_lakehouse_spark.metrics.logger import (  # noqa: F401
    METRICS_SCHEMA,
    MetricsLogger,
)
from dst_spark_k8_lakehouse_spark.metrics import helpers, pipeline  # noqa: F401
