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
    # ---- r12 rotation (VERDICT r11 item 4 — the written r12 front).
    # (a) r11 fails: none.
    # (c) new/changed this round first:
    "s13_kafka_tcp",  # changed: page-generator drain + EARLIEST anchor
    "t10_kafka_tcp_stream",  # changed: per-batch partition re-discovery
    "x13_tcp_bronze",  # rides the changed kafka_tcp stack
    "l2_semdedup",  # changed: hot-cluster second-pass split
    "l2_semdedup_recall",  # its recall contract through the split
    "x3_corpus_health",  # changed: one-tokenize-pass checkpoint plan
    "l6_dsir_scan",  # changed: non-null bucket key + 4-char md5 form
    "d74_lineage",  # changed: listener-path OUTPUT lineage
    "s13_kafka_produce",  # NEW: Produce v3 round trip, write face
    "f5_json",  # changed: one-pass json_tuple extraction
    "t11_kafka_tcp_pipe",  # NEW: kafka→kafka streaming pipe capstone
    # (d) the r05-stale tail named in r11's registry comment — the 19
    # remaining r05-cohort ids (recall contracts, l6/l7 pairs, t4/t5,
    # p-family) plus the deferred cuts, in the written order:
    "l4_embed_quantize",
    "l4_quant_recall",
    "p4_filter_and",
    "p12_dedup_rows",
    "l2_ngram_jaccard",
    "d12_time_travel",
    "l2_minhash_recall",
    "l2_simhash_recall",
    "l2_simhash_sensitivity",
    "l2_embed_fuzzy_recall",
    "l3_bpe_token_count",
    "l3_bpe_learn",
    "l6_split_assign",
    "l6_global_shuffle",
    "l6_pack_sequences_bpe",
    "l6_chunk_docs_bpe",
    "l7_contamination",
    "l7_contamination_scan",
    "l7_fuzzy_decontam",
    "l7_fuzzy_recall",
    "l4_ann_ivf",
    "t4_watermark",
    "t5_stateful_dedup",
    "p5_null_filter",
    "p6_when",
    "p8_cast",
    "p11_fillna",
    "p13_distinct",
    "p14_concat",
    # then the r06 cohort:
    "s13_jdbc_roundtrip",
    "l5_image_decode",
    "l5_audio_decode",
    "l5_video_decode",
    "l5_multimodal",
    "u5_pandas_udf",
    "u5b_pandas_grouped_agg",
    "u6_grouped_map",
    "u7_udtf",
    "l6_chunk_docs",
    # 50 exactly (s13_kafka_produce, t11_kafka_tcp_pipe and the
    # changed f5_json took the last slots; l6_vocab_topk,
    # l6_pack_sequences and l6_stratified_sample move to the r13
    # front). r13 backlog (write down so nothing silently ages):
    # l6_vocab_topk, l6_pack_sequences, l6_stratified_sample,
    # l6_pii_scrub, l6_mixture_epochs (the rest of the r06 l6
    # cohort), l2_embed_recall, l4_ivf_recall, l3_langid,
    # l3_langid_eval, then the r07 cohort (d36-d40, x6, t8) as it
    # becomes the oldest.
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
