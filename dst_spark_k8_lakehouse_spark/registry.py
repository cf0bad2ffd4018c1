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
    # (a) failed in r05: none — 0 CORRECTNESS_r05 failures.
    # (b) implementation changed this round after their last green row:
    # the native-Delta stack (delta_reader/writer/dml rewritten for
    # schema evolution, column mapping, partitioning, commit retries)
    "d16_delta_native_dml",
    "d17_iceberg_native",  # iceberg_writer field-id stamping this round
    "x3_corpus_health",  # boilerplate branch moved to hash-keyed shape
    # (c) new this round
    "d19_delta_schema_merge",
    "d20_delta_partitioned",
    "d21_iceberg_dml",
    "d22_iceberg_partitioned",
    "t6_stream_to_delta",
    "l3_gopher_gate",
    "l6_dsir_select",
    "d24_delta_source",
    "s13_jdbc_roundtrip",
    "d25_iceberg_source",
    "d26_iceberg_mor",
    "d27_delta_dv",
    "d28_delta_cdf",
    "d29_uniform",
    "d30_convert",
    "t7_stream_cdf",
    "d31_iceberg_meta",
    "d32_iceberg_incremental",
    "d33_restore",
    "d34_zorder_native",
    "d35_sql_native",
    "x5_cdc_pipeline",
    "x4_lakehouse_composite",
    "l6_passage_dedup",  # perf pass this round (same oracle)
    "l5_image_decode",  # new: REAL BMP/PPM decode, oracle-checked
    "l5_audio_decode",  # new: REAL WAV decode, oracle-checked
    "l5_multimodal",  # plumbing pass re-check
    # (d) backfill, oldest evidence first (VERDICT r5 item 3): ids
    # whose newest driver-green is r02/r03 and which the r05 ~50-cap
    # cut — first the r02-only block,
    "w2_lag",
    "w3_running_sum",
    "w4_topk_group",
    "o1_sort",
    "o2_sort_limit",
    "u1_union",
    "u2_intersect",
    "u3_except",
    "u4_udf",
    "u5_pandas_udf",
    "u5b_pandas_grouped_agg",
    "u6_grouped_map",
    "u7_udtf",
    "a13_pivot",
    "a13_unpivot",
    "k1_salted_agg",
    "k2_salted_join",
    "x2_q10_returns",
    "l6_chunk_docs",
    "l6_pack_sequences",
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
