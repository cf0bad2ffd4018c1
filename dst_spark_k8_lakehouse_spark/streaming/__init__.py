"""Structured Streaming operators (SURVEY.md §2.10): windowed aggs,
watermarks, stateful dedup, custom stateful operators.

Importing this package registers the batch-checkable window queries.
"""

from dst_spark_k8_lakehouse_spark.streaming import (  # noqa: F401
    pipelines,
    windows,
)
