"""Scalar function sweep (SURVEY.md §2.9): string/date/math/map/json/array."""

from dst_spark_k8_lakehouse_spark.functions import scalars  # noqa: F401
