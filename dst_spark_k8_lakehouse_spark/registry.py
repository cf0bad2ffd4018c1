"""Query registry — the correctness contract surface.

Every operator from SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) plus, where the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string. The driver (and our
own tests) run both sides and compare row-count + schema +
order-insensitive value hash, so registered queries must:

- alias every computed column identically on both sides;
- round float aggregates (summation-order divergence vs DuckDB);
- cast ms/ns timestamps to DATE where day-level semantics suffice;
- be deterministic (total ordering for any top-k/limit selection).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
F = TypeVar("F", bound=QueryFn)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(query_id: str, oracle: str | None = None) -> Callable[[F], F]:
    """Register a query under ``query_id`` with an optional DuckDB oracle.

    Queries with ``oracle=None`` get the driver's weaker rows-only check
    (nondeterministic kept-rows, approx sketches, non-SQL-expressible ops).
    """

    def _register(fn: F) -> F:
        if query_id in QUERIES:
            raise ValueError(f"duplicate query id: {query_id}")
        QUERIES[query_id] = fn
        if oracle is not None:
            ORACLES[query_id] = oracle
        return fn

    return _register


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from dst_spark_k8_lakehouse_spark import functions, llm, operators, streaming  # noqa: F401
    from dst_spark_k8_lakehouse_spark import sources  # noqa: F401
