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
    # (a) failed in r07: none — 0 CORRECTNESS_r07 failures.
    # (b) new this round (r08)
    "l5_video_decode",  # REAL Y4M framing (last multimodal stub closed)
    "d43_iceberg_sortorder",  # WRITE ORDERED BY + sort-aware rewrite
    "x7_ops_lifecycle",  # r8 capstone: maintenance lifecycle + 2-tier pruning
    # (c) implementation changed this round after their last green row:
    # manifest-list partition summaries + manifest-level pruning touch
    # EVERY native-Iceberg read/write; the Delta stats tz-normalization
    # and the plan_file_list extraction touch every native-Delta read
    "d36_iceberg_transforms",
    "d42_iceberg_skipping",
    "d22_iceberg_partitioned",
    "x6_time_partitioned_cdc",
    "d17_iceberg_native",
    "d21_iceberg_dml",
    "d25_iceberg_source",
    "d26_iceberg_mor",
    "d38_iceberg_mor_read",
    "d40_iceberg_changelog",
    "t8_stream_to_iceberg",
    "d29_uniform",
    "d30_convert",
    "d31_iceberg_meta",
    "d32_iceberg_incremental",
    "d33_restore",
    "x4_lakehouse_composite",
    "x5_cdc_pipeline",
    "d16_delta_native_dml",
    "d41_delta_skipping",
    "d39_delta_generated",
    "d37_delta_dv_read",
    "d27_delta_dv",
    "d28_delta_cdf",
    "d35_sql_native",
    # (d) backfill, oldest driver evidence first (VERDICT r7 item 6):
    # the r03-green IVF probe, then the r04 cohort
    "l4_ann_ivf_probe",
    "p1_project",
    "p2_selectexpr",
    "p3_filter_eq",
    "a7_null_audit",
    "a8_dup_count",
    "a9_min_cdist",
    "a10_approx",
    "a10_percentile",
    "a11_rollup",
    "a11_cube",
    "a11_gsets",
    "t1_tumbling",
    "t2_sliding",
    "t3_session",
    "s2_csv_roundtrip",
    "s5_append_sink",
    "f4_map",
    "f5_json",
    "x1_q3_shipping",
    "d12_time_travel",
    "d15_zorder_preserves",
    "l3_langid",
    "l3_langid_eval",
    "l2_embed_recall",
    "l4_ivf_recall",
    "l6_mixture_epochs",
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
