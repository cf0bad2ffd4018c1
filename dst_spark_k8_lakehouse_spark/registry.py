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
    # ---- r11 rotation (VERDICT r10 item 2). (a) r10 fails: none.
    # (c) new/changed this round first:
    "x12_cbo_multiway",  # NEW: NDV-estimate-ordered 3-table join
    "s13_kafka_tcp",  # NEW: socket loopback — Fetch v4 over TCP
    "t10_kafka_tcp_stream",  # NEW: structured streaming over the client
    "x13_tcp_bronze",  # NEW capstone: TCP -> stream -> exactly-once delta
    "l2_semdedup",  # NEW: k-means-bucketed semantic dedup (SemDeDup)
    "l2_semdedup_recall",  # NEW: its planted-recall oracle contract
    "d49_puffin_ndv",  # changed: single-pass sketch build (one job)
    "x10_cbo_join",  # cbo.py gained estimate/order functions
    "j8_star_join",  # changed: single-partition final sort; also the
    # head of the r10-trimmed tail the verdict names for r11
    "x1_q3_shipping",  # star-join family re-measured this round
    "x2_q10_returns",
    # (b) the r10-trimmed backlog (registry comment r10; VERDICT item
    # 2 names these as the written r11 front):
    "j7_asof",
    "j6_range_join",
    "d39_delta_generated",
    "d28_delta_cdf",
    "d24_delta_source",
    "d16_delta_native_dml",
    "d41_delta_skipping",
    "u1_union",
    "u2_intersect",
    "u3_except",
    "u4_udf",
    "t6_stream_to_delta",
    "o1_sort",
    "o2_sort_limit",
    "w2_lag",
    "w3_running_sum",
    "w4_topk_group",
    "k1_salted_agg",
    "k2_salted_join",
    # (d) the r05-stale cohort (44 ids whose last driver row is r05;
    # VERDICT item 2 asks ≥15 per round — 25 here, the l2/l3/l4 block
    # plus the named a12/a13/d10-d13/p/w1 set; the remaining 19
    # (recall contracts, l6/l7 pairs, t4/t5) front r12):
    "a12_summary",
    "a13_pivot",
    "a13_unpivot",
    "d10_update_sql",
    "d11_delete_sql",
    "d13_merge_sql",
    "w1_rank",
    "l2_minhash_lsh",
    "l2_minhash_lsh_sigs",
    "l2_simhash",
    "l2_embed_neardup",
    "l3_text_stats",
    "l3_quality_score",
    "l3_token_count",
    "l3_fingerprint",
    "l3_repetition_stats",
    "l3_unigram_logprob",
    "l4_cosine_topk",
    "l4_batch_topk",
    "d74_lineage",  # NEW: lineage extraction/emission, oracle-checked
    # 50 exactly (p12_dedup_rows, p4_filter_and and the r07-green
    # l2_ngram_jaccard moved to the r12 front as s13_kafka_tcp,
    # t10_kafka_tcp_stream and d74_lineage landed; the r05-cohort
    # share stays 16 ≥ the verdict's 15). r12 backlog (write down so
    # nothing silently ages): l4_embed_quantize/l4_quant_recall (cut
    # for the semdedup pair), p4_filter_and, p12_dedup_rows,
    # l2_ngram_jaccard, d12_time_travel (r09-green; cut for x13),
    # l2_minhash_recall/l2_simhash_recall/l2_simhash_sensitivity/
    # l2_embed_fuzzy_recall, l3_bpe_token_count/l3_bpe_learn,
    # l6_split_assign/l6_global_shuffle/l6_pack_sequences_bpe/
    # l6_chunk_docs_bpe, l7_contamination(+_scan)/l7_fuzzy_decontam/
    # l7_fuzzy_recall, l4_ann_ivf, t4_watermark/t5_stateful_dedup,
    # p5/p6/p8/p11/p13/p14, then the r06 cohort (s13_jdbc_roundtrip,
    # l6 five, a13 pair done above, u5-u7, l5 decode family).
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
    from dst_spark_k8_lakehouse_spark import lineage, sources  # noqa: F401
    from dst_spark_k8_lakehouse_spark.plans import lakehouse_queries  # noqa: F401

    _apply_priority()
