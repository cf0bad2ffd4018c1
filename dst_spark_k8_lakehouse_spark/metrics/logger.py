"""Metrics event log: schema + batched logger.

Capability parity with the reference's ``modules/dst_metrics/
spark_logger.py:15-59`` + ``core.py:4-37`` (same 15-column explicit
StructType — "Define schema explicitly to avoid inference errors" — same
record semantics), with the design flaw fixed: the reference commits one
Delta transaction per ``log_metric`` call (``spark_logger.py:49-59``, a
full write job per event). Here events buffer driver-side (they are tiny
dicts produced at driver rate, never executor data) and flush as ONE
append per flush point — at 100 TB-pipeline cadence that is the
difference between thousands of commits and a handful.

Sink is pluggable: a ``VersionedTable`` (parquet, time-travellable —
the default) or any ``DataFrame``-accepting callable (Delta writer on a
cluster that ships the jars).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.plans.table import VersionedTable

# Mirrors METRICS_SCHEMA at reference spark_logger.py:15-34 (15 fields,
# all nullable; `extra` is the only complex type in the whole reference).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("layer", T.StringType()),
        T.StructField("project", T.StringType()),
        T.StructField("dataset_year", T.IntegerType()),
        T.StructField("description", T.StringType()),
        T.StructField("metric_value", T.DoubleType()),
        T.StructField("metric_unit", T.StringType()),
        T.StructField("metric_function", T.StringType()),
        T.StructField("job_name", T.StringType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
        T.StructField("status", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("source_path", T.StringType()),
    ]
)


def build_record(
    layer: Any,
    project: str,
    dataset_year: int,
    description: str,
    value: float,
    unit: str,
    function: str,
    job_name: str | None = None,
    extra: dict[str, str] | None = None,
    run_id: str | None = None,
    status: str | None = None,
    duration_ms: int | None = None,
    table_name: str | None = None,
    source_path: str | None = None,
) -> dict[str, Any]:
    """One metric event (field semantics per reference ``core.py:4-37``:
    layer stringified, value floated, UTC wall-clock stamp)."""
    return {
        "event_timestamp": datetime.now(timezone.utc).replace(tzinfo=None),
        "run_id": run_id or str(uuid.uuid4()),
        "layer": str(layer),
        "project": project,
        "dataset_year": int(dataset_year),
        "description": description,
        "metric_value": float(value),
        "metric_unit": unit,
        "metric_function": function,
        "job_name": job_name,
        "extra": extra or {},
        "status": status,
        "duration_ms": duration_ms,
        "table_name": table_name,
        "source_path": source_path,
    }


class MetricsLogger:
    """Buffered metrics logger with a pluggable append sink."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str | None = None,
        sink: Callable[[DataFrame], None] | None = None,
    ):
        if (table_path is None) == (sink is None):
            raise ValueError("exactly one of table_path / sink required")
        self.spark = spark
        if sink is None:
            table = VersionedTable(spark, table_path)

            def sink(df: DataFrame) -> None:
                import os

                if os.path.exists(table._manifest_path()):
                    table.append(df)
                else:
                    table.create(df)

        self._sink = sink
        self._buffer: list[dict[str, Any]] = []

    def log_metric(self, **kwargs: Any) -> str:
        """Buffer one event; returns its run_id (reference
        ``spark_logger.py:47-59`` returns the same)."""
        rec = build_record(**kwargs)
        self._buffer.append(rec)
        return rec["run_id"]

    @property
    def pending(self) -> int:
        return len(self._buffer)

    def flush(self) -> int:
        """Write all buffered events as ONE append; returns rows written."""
        if not self._buffer:
            return 0
        df = self.spark.createDataFrame(self._buffer, schema=METRICS_SCHEMA)
        self._sink(df)
        n = len(self._buffer)
        self._buffer.clear()
        return n
