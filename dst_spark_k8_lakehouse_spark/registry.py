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
    # (a) failed in r04: none — 0 CORRECTNESS_r04 failures.
    # (b) implementation changed this round after their last green row:
    # minhash pair (dedup.py null-token guard), lakehouse DML trio
    # (dml.py quote-aware splitter), streaming pair (pipelines.py ts
    # normalization), contamination (hashed-gram rewrite of the module)
    "l2_minhash_lsh",
    "l2_minhash_lsh_sigs",
    "d10_update_sql",
    "d11_delete_sql",
    "d13_merge_sql",
    "t4_watermark",
    "t5_stateful_dedup",
    "l7_contamination",
    # (c) new this round
    "d16_delta_native_dml",
    "d17_iceberg_native",
    "l6_passage_dedup",
    "l3_unigram_logprob",
    "l7_fuzzy_decontam",
    "l7_fuzzy_recall",
    "l4_embed_quantize",
    "l4_quant_recall",
    "l3_bpe_learn",
    "x3_corpus_health",
    "l2_simhash_sensitivity",
    "l2_embed_fuzzy_recall",
    "l2_minhash_recall",  # re-front: signature family fixed this round
    "l2_simhash_recall",
    "l7_contamination_scan",
    "l3_bpe_token_count",
    "l6_pack_sequences_bpe",
    "l6_chunk_docs_bpe",
    "l3_repetition_stats",
    "l6_split_assign",
    "l6_global_shuffle",
    # l4_cosine_topk / l4_batch_topk gained the Arrow-GEMM switch this
    # round (changed-after-green at sfs ABOVE the switch; the driver's
    # sf0.01 run exercises the unchanged HOF path, pytest covers GEMM)
    "l4_cosine_topk",
    "l4_batch_topk",
    # (d) backfill, oldest evidence first (VERDICT r4 item 2): first
    # the ids cut by the r04 ~50-query cap (still r01-green-only),
    "l3_fingerprint",
    "l4_ann_ivf",
    "l5_multimodal",
    "a11_gsets",
    "a12_summary",
    "l2_simhash",
    "l2_embed_neardup",
    "l3_text_stats",
    "l3_quality_score",
    "l3_token_count",
    # then every id whose newest green row is r02,
    "p4_filter_and",
    "p5_null_filter",
    "p6_when",
    "p8_cast",
    "p11_fillna",
    "p12_dedup_rows",
    "p13_distinct",
    "p14_concat",
    "w1_rank",
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
    # then the r03 greens (newest-but-one evidence; cap may cut here)
    "f1_string",
    "f2_date",
    "f3_math",
    "f6_array",
    "s1_parquet_scan",
    "s8_range",
    "l1_exact_dedup",
    "l2_ngram_jaccard",
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
