"""Relational operator inventory (SURVEY.md §2.3-2.8).

Importing this package registers every operator query in the registry.
"""

from dst_spark_k8_lakehouse_spark.operators import (  # noqa: F401
    aggregations,
    joins,
    projections,
    setops,
    skew,
    sorts,
    udfs,
    windows,
)
