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
    # (a) failed in r09 — ALL were the iceberg_writer `import re`
    # regression (VERDICT r9 item 1, fixed this round); front every one
    # so CORRECTNESS_r10 proves the fix.
    "d43_iceberg_sortorder",  # also (c): rewrite now consumes full sort fields
    "x7_ops_lifecycle",
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
    "x5_cdc_pipeline",
    "d37_delta_dv_read",
    "d35_sql_native",
    "l4_ann_ivf_probe",
    # (d) backfill: five ids whose last driver-green row is r04 — they
    # sat past the 50-slot cap for five rounds (VERDICT r9 item 4).
    "l3_langid",
    "l3_langid_eval",
    "l2_embed_recall",
    "l4_ivf_recall",
    "l6_mixture_epochs",
    # (c) new this round (r10)
    "s13_kafka_wire",  # RecordBatch v2 wire codec loopback (S13)
    "d44_iceberg_wap",  # write-audit-publish: branch write + fast_forward
    "f7_variant",  # Spark 4 VARIANT semi-structured extraction
    "d45_delta_clone",  # SHALLOW CLONE: zero-copy fork + contained DML
    "x8_wire_to_publish",  # capstone: kafka wire -> branch stage -> publish -> pruned read
    "d46_checkpoint_v2",  # V2 sidecar checkpoints: shard planning state
    "d47_liquid_clustering",  # CLUSTER BY + incremental OPTIMIZE pass
    "d48_version_checksum",  # crc sidecars: O(1) stats + replay audit
    "d49_puffin_ndv",  # Puffin stats file + KMV ndv sketches
    "d50_type_widening",  # metadata-only ALTER COLUMN TYPE + promotion
    "d51_row_tracking",  # stable row ids: backfill/append/DV/OPTIMIZE
    "x9_layout_lifecycle",  # capstone: cluster->optimize->cpv2->crc
    "d52_iceberg_dv",  # v3-style puffin deletion vectors on v2 MoR
    "d53_column_defaults",  # initial/write-default vs CURRENT_DEFAULT
    "d54_identity",  # watermark-lattice id allocation, footer-stat bump
    "d55_ict",  # in-commit timestamps: content-resolved time travel
    "d56_partition_stats",  # partition-statistics sidecar from manifests
    "x10_cbo_join",  # capstone: sidecar stats drive the broadcast decision
    "d57_drop_column",  # metadata-only drop + the resurrection guard
    "d58_rewrite_pos_deletes",  # consolidate+de-dangle MoR delete files
    "x11_contract_lifecycle",  # capstone: the writer-contract features compose
    "d59_ref_retention",  # written-down per-ref expiry + ancestry windows
    "d60_log_retention",  # metadata cleanup: checkpoint as baseline
    # (c) implementation changed this round: the Delta columnar planner
    # gained a no-predicate short-circuit and the physical/logical
    # partitionValues coalesce fix — re-check every native-Delta id.
    # (the r06-green u1/u2/u3/u4/t6 backfill tail — and then
    # o2_sort_limit/o1_sort/w4_topk_group/w3_running_sum/w2_lag/
    # w1_rank/k2_salted_join/k1_salted_agg as d46-d52+x9 landed;
    # j8_star_join/j7_asof/j6_range_join, the r09-green
    # d39_delta_generated/d28_delta_cdf and the r06-green+pytested
    # d24_delta_source as d53-d57+x10 landed — was
    # trimmed to keep the rotation exactly 50 so nothing silently
    # falls past the driver's cap; the trimmed ids front r11)
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
