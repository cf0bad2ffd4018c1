"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dst_spark_k8_lakehouse_spark``; this module
is a thin view over its query registry (one entry per SURVEY.md §2
operator row).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dst_spark_k8_lakehouse_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation over
    the full star schema (filter→join→agg→sort, the reference's
    canonical pipeline shape, ``05_datahub_lineage_demo.ipynb:147-175``)."""
    return registry.QUERIES["j8_star_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; keys without an entry get
    the driver's weaker rows-only check (nondeterministic / sketch /
    non-SQL-expressible operators)."""
    return dict(registry.ORACLES)
