"""Sources & sinks (SURVEY.md §2.1): testdata catalog, scan/sink queries."""

from dst_spark_k8_lakehouse_spark.sources.catalog import TABLES, load_table, register_views
from dst_spark_k8_lakehouse_spark.sources import scans  # noqa: F401  (registers queries)
from dst_spark_k8_lakehouse_spark.sources import kafka_wire  # noqa: F401  (registers queries)
from dst_spark_k8_lakehouse_spark.sources import kafka_broker  # noqa: F401  (registers queries)
from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source  # noqa: F401  (registers queries)

__all__ = ["TABLES", "load_table", "register_views"]
