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


# Driver-coverage rotation (COVERAGE.md "driver rotation"): the
# per-round CORRECTNESS run checks queries in dict-iteration order and
# may cap at ~50, so ids that still lack a green CORRECTNESS row in any
# prior round are listed here to iterate FIRST. Round 1 covered registry
# positions 1-50 (CORRECTNESS_r01.json); round 2 therefore fronts the 24
# ids that were cut off, plus any ids new this round.
PRIORITY: list[str] = [
    # new in round 2
    "u5b_pandas_grouped_agg",
    "l4_ann_ivf_probe",
    "l2_minhash_lsh_sigs",
    "l6_chunk_docs",
    "l6_pack_sequences",
    "l6_stratified_sample",
    "l6_pii_scrub",
    "l6_vocab_topk",
    "x2_q10_returns",
    "a13_pivot",
    "a13_unpivot",
    "k1_salted_agg",
    "k2_salted_join",
    # untested in round 1 (registry positions 51-74)
    "p4_filter_and",
    "p5_null_filter",
    "p6_when",
    "p8_cast",
    "p11_fillna",
    "p12_dedup_rows",
    "p13_distinct",
    "p14_concat",
    "u1_union",
    "u2_intersect",
    "u3_except",
    "o1_sort",
    "o2_sort_limit",
    "u4_udf",
    "u5_pandas_udf",
    "u6_grouped_map",
    "u7_udtf",
    "w1_rank",
    "w2_lag",
    "w3_running_sum",
    "w4_topk_group",
    "t1_tumbling",
    "t2_sliding",
    "t3_session",
]


def _apply_priority() -> None:
    """Rebuild QUERIES/ORACLES iteration order: PRIORITY ids first."""
    ordered = {qid: QUERIES[qid] for qid in PRIORITY if qid in QUERIES}
    for qid, fn in QUERIES.items():
        ordered.setdefault(qid, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {qid: ORACLES[qid] for qid in ordered if qid in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from dst_spark_k8_lakehouse_spark import functions, llm, operators, streaming  # noqa: F401
    from dst_spark_k8_lakehouse_spark import sources  # noqa: F401

    _apply_priority()
