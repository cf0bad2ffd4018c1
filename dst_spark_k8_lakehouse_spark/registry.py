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
# may cap at ~50, so each round this list fronts, in order: (a) ids that
# FAILED last round, (b) ids whose implementation changed after their
# last driver-green row, (c) ids new/changed this round, (d) backfill of
# ids whose only green row is the oldest (round 1). Rotation log with
# last-green round per id lives in COVERAGE.md.
PRIORITY: list[str] = [
    # (a) failed in r03 — events.ts parquet encoding change, fixed in
    # sources/catalog.py this round
    "t1_tumbling",
    "t2_sliding",
    "t3_session",
    "f4_map",
    "f5_json",
    # (b) events-dependent / changed after last green (r01)
    "j7_asof",
    "x1_q3_shipping",
    "l4_cosine_topk",
    "l4_batch_topk",
    # (c) touched this round
    "l2_minhash_lsh",
    "l2_minhash_lsh_sigs",
    "a10_approx",
    "l3_langid",
    "l3_langid_eval",
    "t4_watermark",
    "t5_stateful_dedup",
    "l2_minhash_recall",
    "l2_simhash_recall",
    "l2_embed_recall",
    "l4_ivf_recall",
    "l7_contamination",
    "l6_mixture_epochs",
    "d10_update_sql",
    "d11_delete_sql",
    "d12_time_travel",
    "d13_merge_sql",
    "d15_zorder_preserves",
    "s2_csv_roundtrip",
    "s5_append_sink",
    # (d) backfill: only green row is r01 — oldest evidence first
    "p1_project",
    "p2_selectexpr",
    "p3_filter_eq",
    "j1_inner_join",
    "j3_left_join",
    "j4_semi",
    "j4_anti",
    "j5_broadcast",
    "j6_range_join",
    "j8_star_join",
    "a1_count",
    "a2_avg",
    "a3_sum",
    "a4_filtered_count",
    "a5_groupby_agg",
    "a7_null_audit",
    "a8_dup_count",
    "a9_min_cdist",
    "a10_percentile",
    "a11_rollup",
    "a11_cube",
    "a11_gsets",
    "a12_summary",
    "l2_simhash",
    "l2_embed_neardup",
    "l3_text_stats",
    "l3_quality_score",
    "l3_token_count",
    "l3_fingerprint",
    "l4_ann_ivf",
    "l5_multimodal",
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
    from dst_spark_k8_lakehouse_spark.plans import lakehouse_queries  # noqa: F401

    _apply_priority()
