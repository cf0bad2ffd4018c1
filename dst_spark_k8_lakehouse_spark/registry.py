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
    # (a) failed in r06: none — 0 CORRECTNESS_r06 failures.
    # (c) new this round (r07)
    "d36_iceberg_transforms",  # hidden partition transforms, days(ts)
    "l6_dsir_scan",  # DSIR hashed-bucket production path
    "d37_delta_dv_read",  # native READ trackers (HEADLINE members)
    "d38_iceberg_mor_read",
    "d39_delta_generated",  # generated columns = Delta hidden partitioning
    "x6_time_partitioned_cdc",  # r7 capstone: gen-col CDF source →
    # spec-evolved Iceberg replica, transform-pruned read across specs
    "t8_stream_to_iceberg",  # exactly-once stream → days(ts) Iceberg
    "d40_iceberg_changelog",  # row-level changelog (Iceberg's CDF)
    "d41_delta_skipping",  # per-add stats file skipping, unpartitioned
    "d42_iceberg_skipping",  # manifest column-bounds skipping
    # (b) implementation changed this round after their last green row:
    # delta_dv's bitmap build moved executor-side; the Iceberg
    # writer/reader partition-spec handling became transform-aware
    # (every native-Iceberg id re-fronts)
    "d27_delta_dv",
    "d17_iceberg_native",
    "d21_iceberg_dml",
    "d22_iceberg_partitioned",
    "d26_iceberg_mor",
    "d25_iceberg_source",
    "d29_uniform",
    "d30_convert",
    "d31_iceberg_meta",
    "d32_iceberg_incremental",
    "d33_restore",
    "d35_sql_native",
    "x4_lakehouse_composite",
    "x5_cdc_pipeline",
    "d16_delta_native_dml",
    "d28_delta_cdf",
    # (d) backfill, oldest evidence first: the three r02-only-green
    # ids the r06 ~50-cap cut,
    "l6_stratified_sample",
    "l6_pii_scrub",
    "l6_vocab_topk",
    # then the r03 greens,
    "f1_string",
    "f2_date",
    "f3_math",
    "f6_array",
    "s1_parquet_scan",
    "s8_range",
    "l1_exact_dedup",
    "l2_ngram_jaccard",
    # then the oldest r04 greens (cap may cut here; all remain
    # SELFCHECK-covered)
    "j1_inner_join",
    "j3_left_join",
    "j4_semi",
    "j4_anti",
    "j5_broadcast",
    "j6_range_join",
    "j7_asof",
    "j8_star_join",
    "a1_count",
    "a2_avg",
    "a3_sum",
    "a4_filtered_count",
    "a5_groupby_agg",
    "x1_q3_shipping",
    "t1_tumbling",
    "t2_sliding",
    "t3_session",
    "f4_map",
    "f5_json",
    # then the r05 greens the caps have not revisited since
    "p4_filter_and",
    "p5_filter_or",
    "p6_filter_in",
    "p7_filter_like",
    "p8_filter_null",
    "p9_case_when",
    "p10_cast",
    "p11_concat",
    "p12_distinct",
    "p13_sample",
    "p14_limit_offset",
    "w1_rank",
    "a6_multi_agg",
    "a7_having",
    "a8_countd",
    "a9_approx_countd",
    "a10_corr_cov",
    "a10_skew_kurt",
    "a11_rollup",
    "a11_cube",
    "a11_gsets",
    "a12_summary",
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
