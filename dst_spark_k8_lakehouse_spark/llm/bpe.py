"""Deterministic subword (BPE) tokenizer for training-data accounting.

``l3_token_count``'s whitespace and regex counts approximate what a
trainer sees; real pipelines budget context windows in SUBWORD tokens.
This module adds a fully deterministic BPE over a FIXED merges table
(VERDICT r4 item 6) so chunking/packing can be parameterized by the
same tokenizer the trainer uses:

- **Pre-tokenization**: ``textstats.BPE_REGEX`` over ``lower(text)``
  (letter runs / digit runs / single symbols) — identical in Python
  (worker), Spark SQL, and DuckDB.
- **Merge procedure**: sentencepiece-style — per step, merge the
  single leftmost occurrence of the lowest-rank adjacent pair; repeat
  until no pair is in the table. One merge per step makes the
  procedure order-deterministic AND expressible as a DuckDB recursive
  CTE, which is what lets the driver value-check a *subword* tokenizer
  against SQL (the merges table is a static list literal in the
  oracle; rank = list position).
- **Spark side**: the tokenize loop is per-WORD, so it runs once per
  distinct word per worker (process-level memo) inside a vectorized
  ``mapInArrow`` stage — the same custom-operator tier as the minhash
  signature stage. Natural-language vocabularies grow ~O(sqrt(corpus))
  (Heaps' law), so the memo hit rate climbs with scale; at 100 TB the
  stage stays map-only (no shuffle) and the memo stays MBs.

Reference anchor: notebook token-count hygiene in
``06_pipeline_metrics_demo.ipynb`` (whitespace counts); the subword
layer is the engine-side extension the trainer contract needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.llm.curation import CHUNK, CTX, STRIDE
from dst_spark_k8_lakehouse_spark.llm.textstats import BPE_REGEX
from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

# The FIXED merges table (rank = index). Hand-authored from common
# English digraph/suffix frequency; later rules build on the tokens
# earlier rules create (e.g. 'th'+'e' → 'the'). Frozen: changing this
# table changes every BPE count, so it versions with the engine, like
# a tokenizer.json ships with a model.
MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("e", "n"),
    ("a", "t"),
    ("e", "s"),
    ("o", "r"),
    ("s", "t"),
    ("a", "r"),
    ("o", "u"),
    ("l", "e"),
    ("i", "s"),
    ("i", "t"),
    ("a", "l"),
    ("e", "d"),
    ("c", "o"),
    ("s", "e"),
    ("n", "e"),
    ("d", "e"),
    ("th", "e"),
    ("in", "g"),
    ("an", "d"),
    ("t", "o"),
    ("o", "f"),
    ("h", "a"),
    ("h", "e"),
    ("m", "a"),
    ("c", "h"),
    ("l", "l"),
    ("v", "e"),
    ("r", "i"),
    ("r", "o"),
    ("l", "i"),
    ("r", "a"),
    ("c", "e"),
    ("u", "r"),
    ("m", "e"),
    ("t", "i"),
    ("ti", "on"),
    ("e", "a"),
    ("i", "c"),
    ("s", "i"),
    ("o", "m"),
    ("b", "e"),
    ("w", "h"),
    ("p", "r"),
    ("f", "or"),
    ("w", "i"),
    ("wi", "th"),
    ("th", "at"),
    ("th", "is"),
    ("n", "o"),
    ("n", "t"),
    ("p", "o"),
    ("p", "a"),
    ("u", "s"),
    ("g", "e"),
    ("d", "i"),
    ("s", "u"),
    ("m", "o"),
    ("t", "a"),
    ("e", "l"),
    ("f", "i"),
    ("k", "e"),
    ("w", "e"),
    ("b", "o"),
    ("s", "o"),
    ("e", "x"),
    ("p", "e"),
    ("u", "n"),
    ("a", "b"),
    ("p", "l"),
    ("g", "r"),
    ("c", "l"),
    ("s", "h"),
    ("the", "y"),
    ("ing", "s"),
    ("er", "s"),
    ("or", "s"),
    ("es", "s"),
    ("a", "ll"),
    ("ou", "t"),
    ("ou", "r"),
    ("b", "y"),
    ("m", "y"),
    ("u", "p"),
    ("d", "o"),
    ("g", "o"),
    ("i", "f"),
]

_RANKS: dict[tuple[str, str], int] = {p: r for r, p in enumerate(MERGES)}

# list literal for the DuckDB oracle: rank = list_position (1-based)
_MERGES_SQL = "[" + ", ".join(f"'{a} {b}'" for a, b in MERGES) + "]"


def bpe_word(word: str) -> list[str]:
    """Reference tokenizer: merge the leftmost occurrence of the
    lowest-rank adjacent pair, one merge per step, until no adjacent
    pair is in MERGES. Deterministic; identical to the recursive-CTE
    oracle by construction."""
    toks = list(word)
    while True:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = _RANKS.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            return toks
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]


# Driver-side memo for the reference tokenizer (tests, oracles).
_WORD_MEMO: dict[str, tuple[str, ...]] = {}


def _bpe_doc(text: str) -> list[str]:
    import re

    out: list[str] = []
    for w in re.findall(BPE_REGEX, (text or "").lower()):
        hit = _WORD_MEMO.get(w)
        if hit is None:
            hit = tuple(bpe_word(w))
            _WORD_MEMO[w] = hit
        out.extend(hit)
    return out


def _bpe_batches(
    columns: list[str],
    want_tokens: bool,
    merges: list[tuple[str, str]] | None = None,
):
    """mapInArrow generator: per batch, BPE-tokenize every doc; emit
    the carried ``columns`` + bpe_tokens count (+ the token array when
    ``want_tokens``).

    SELF-CONTAINED by design: the closure captures only plain data
    (the ranks dict, the regex string) — a reference to any
    module-level function would make cloudpickle serialize it by
    module path, and Python workers don't have the repo on their
    import path (the minhash stage follows the same rule)."""
    ranks = (
        dict(_RANKS)
        if merges is None
        else {p: r for r, p in enumerate(merges)}
    )
    pattern = BPE_REGEX

    def gen(batches):
        import re

        import pyarrow as pa

        memo: dict[str, tuple[str, ...]] = {}

        def word_toks(word: str) -> tuple[str, ...]:
            hit = memo.get(word)
            if hit is not None:
                return hit
            toks = list(word)
            while True:
                best_rank = None
                best_i = -1
                for i in range(len(toks) - 1):
                    r = ranks.get((toks[i], toks[i + 1]))
                    if r is not None and (
                        best_rank is None or r < best_rank
                    ):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                toks[best_i : best_i + 2] = [
                    toks[best_i] + toks[best_i + 1]
                ]
            out = tuple(toks)
            memo[word] = out
            return out

        rx = re.compile(pattern)
        for batch in batches:
            texts = batch.column("text").to_pylist()
            toks = [
                [
                    t
                    for w in rx.findall((txt or "").lower())
                    for t in word_toks(w)
                ]
                for txt in texts
            ]
            arrays = [batch.column(c) for c in columns]
            names = list(columns)
            arrays.append(
                pa.array([len(t) for t in toks], type=pa.int32())
            )
            names.append("bpe_tokens")
            if want_tokens:
                arrays.append(
                    pa.array(toks, type=pa.list_(pa.string()))
                )
                names.append("btok")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return gen


def bpe_token_counts(
    docs: DataFrame,
    carry: list[str],
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(carry…, bpe_tokens) — map-only vectorized count stage.
    ``merges``: a learned table from ``learn_bpe_merges`` (defaults to
    the frozen MERGES that the oracle-checked queries pin)."""
    schema = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )
    return docs.select(*carry, "text").mapInArrow(
        _bpe_batches(carry, want_tokens=False, merges=merges),
        f"{schema}, bpe_tokens int",
    )


def bpe_token_arrays(docs: DataFrame, carry: list[str]) -> DataFrame:
    """(carry…, bpe_tokens, btok) — count + token array, for chunking."""
    schema = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )
    return docs.select(*carry, "text").mapInArrow(
        _bpe_batches(carry, want_tokens=True),
        f"{schema}, bpe_tokens int, btok array<string>",
    )


# Shared oracle fragment: terminal BPE token list per distinct word.
# Same procedure as bpe_word: candidate pairs ranked by list_position
# against the static merges literal; the struct sort picks (rank, i)
# minimal; recursion stops when no candidate remains; `term` keeps the
# unique terminal state per word.
_BPE_CTE = f"""
        pre AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{BPE_REGEX}') AS ws
            FROM documents
        ),
        word AS (
            SELECT DISTINCT unnest(ws) AS w FROM pre
        ),
        bpe(w, toks) AS (
            SELECT w, string_split(w, '') FROM word
            UNION ALL
            SELECT w,
                   list_concat(
                       list_concat(
                           list_slice(toks, 1, b['i'] - 1),
                           [toks[b['i']] || toks[b['i'] + 1]]
                       ),
                       list_slice(toks, b['i'] + 2, len(toks))
                   )
            FROM (
                SELECT w, toks,
                       (list_sort(list_filter(
                           list_transform(range(1, len(toks)),
                               i -> {{'r': list_position({_MERGES_SQL},
                                          toks[i] || ' ' || toks[i + 1]),
                                      'i': i}}),
                           s -> s['r'] IS NOT NULL AND s['r'] > 0)))[1] AS b
                FROM bpe
            )
            WHERE b IS NOT NULL
        ),
        term AS (
            SELECT w, toks FROM (
                SELECT w, toks,
                       (list_sort(list_filter(
                           list_transform(range(1, len(toks)),
                               i -> {{'r': list_position({_MERGES_SQL},
                                          toks[i] || ' ' || toks[i + 1]),
                                      'i': i}}),
                           s -> s['r'] IS NOT NULL AND s['r'] > 0)))[1] AS b
                FROM bpe
            ) WHERE b IS NULL
        )
"""


@query(
    "l3_bpe_token_count",
    oracle=f"""
        WITH RECURSIVE
        {_BPE_CTE},
        cnt AS (
            SELECT p.doc_id, SUM(len(t.toks)) AS n
            FROM (SELECT doc_id, unnest(ws) AS w FROM pre) p
            JOIN term t ON p.w = t.w
            GROUP BY p.doc_id
        )
        SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS INT) AS bpe_tokens
        FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
    """,
)
def l3_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: subword token count per document under the fixed-merges BPE
    — the number a trainer's data loader would see. Map-only Arrow
    stage; value-checked against the recursive-CTE oracle running the
    identical merge procedure."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, carry=["doc_id"])


@query(
    "l6_pack_sequences_bpe",
    oracle=f"""
        WITH RECURSIVE
        {_BPE_CTE},
        cnt AS (
            SELECT p.doc_id, SUM(len(t.toks)) AS n
            FROM (SELECT doc_id, unnest(ws) AS w FROM pre) p
            JOIN term t ON p.w = t.w
            GROUP BY p.doc_id
        ),
        tt AS (
            SELECT d.source, d.doc_id,
                   CAST(COALESCE(c.n, 0) AS INT) AS n_tokens
            FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
        )
        SELECT source, doc_id, n_tokens,
               CAST((sum(n_tokens) OVER w - n_tokens) // {CTX} AS INT)
                   AS pack_id,
               CAST((sum(n_tokens) OVER w - n_tokens) % {CTX} AS INT)
                   AS pack_offset
        FROM tt
        WINDOW w AS (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING)
    """,
)
def l6_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 variant: sequence packing budgeted in BPE tokens — identical
    per-shard layout to ``l6_pack_sequences``, parameterized by the
    tokenizer (same window plan: one shuffle on the shard key, never a
    global order)."""
    from pyspark.sql import Window

    counts = bpe_token_counts(
        load_table(spark, sf_dir, "documents"), carry=["source", "doc_id"]
    ).withColumnRenamed("bpe_tokens", "n_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return counts.select(
        "source",
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (start / CTX).cast("int").alias("pack_id"),
        (start % CTX).cast("int").alias("pack_offset"),
    )


@query(
    "l6_chunk_docs_bpe",
    oracle=f"""
        WITH RECURSIVE
        {_BPE_CTE},
        seq AS (
            SELECT p.doc_id,
                   flatten(array_agg(t.toks ORDER BY p.ord)) AS btok
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(ws) + 1),
                             i -> {{'ord': i, 'w': ws[i]}}),
                             recursive := true)
                  FROM pre) p
            JOIN term t ON p.w = t.w
            GROUP BY p.doc_id
        )
        SELECT doc_id,
               CAST(s // {STRIDE} AS INT) AS chunk_idx,
               CAST(len(list_slice(btok, s + 1, s + {CHUNK})) AS INT)
                   AS n_tokens,
               array_to_string(list_slice(btok, s + 1, s + {CHUNK}), ' ')
                   AS chunk_text
        FROM seq, unnest(range(0, len(btok), {STRIDE})) AS u(s)
    """,
)
def l6_chunk_docs_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 variant: sliding-window chunking in BPE token space — same
    windowing constants and plan shape as ``l6_chunk_docs`` (map-side
    explode, no shuffle), tokenizer swapped to the subword layer.
    Documents with no pre-tokens produce no chunks (matching the ws
    version's behavior on empty token arrays)."""
    toks = bpe_token_arrays(
        load_table(spark, sf_dir, "documents"), carry=["doc_id"]
    ).filter(F.size("btok") > 0)
    return (
        toks.select(
            "doc_id",
            "btok",
            F.explode(
                F.expr(f"sequence(0, size(btok) - 1, {STRIDE})")
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / STRIDE).cast("int").alias("chunk_idx"),
            F.size(F.expr(f"slice(btok, s + 1, {CHUNK})"))
            .cast("int")
            .alias("n_tokens"),
            F.concat_ws(" ", F.expr(f"slice(btok, s + 1, {CHUNK})")).alias(
                "chunk_text"
            ),
        )
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merges table from a corpus (Sennrich et al. 2016),
    structured so corpus-size work happens exactly ONCE:

    1. **One corpus pass**: word-frequency vocab over the same
       ``BPE_REGEX`` pre-tokens the tokenizer uses. Wordcount shape —
       at 100 TB this is the only stage that touches every document,
       and the result is Heaps'-law sized (~O(√corpus) rows).
    2. **n_merges vocab-sized rounds**: count adjacent symbol pairs
       weighted by word count (one partial-agg job over the vocab),
       pick the winner deterministically (count desc, then pair asc),
       and merge every non-overlapping occurrence left-to-right in
       one HOF fold. The vocab frame is eagerly localCheckpoint'ed
       per round — constant-depth lineage across rounds.

    The 1-row-per-round collect is the OUTPUT (the rule being
    learned), not a data path. Learning merges all occurrences per
    round (batch style); application (``bpe_word``) merges
    rank-lowest-first — both consume the same ranked table, the
    standard train/apply split.

    Returns the merges list, directly usable as
    ``bpe_token_counts(docs, carry, merges=learned)``.
    """
    spark = docs.sparkSession
    vocab = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{BPE_REGEX}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.expr("split(w, '')").alias("toks"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    pair_struct = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(toks[i - 1] AS a, toks[i] AS b))"
    )
    for _ in range(n_merges):
        best = (
            vocab.filter(F.size("toks") >= 2)
            .select(F.explode(pair_struct).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0].n < min_pair_count:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b))
        # merge every non-overlapping (a, b) left-to-right: a fold that
        # joins x onto the accumulator's tail when (tail, x) == (a, b).
        # Columns pa/pb carry the pair into the lambda — no SQL-literal
        # injection for symbol tokens like quotes.
        vocab = (
            vocab.withColumns({"pa": F.lit(a), "pb": F.lit(b)})
            .withColumn(
                "toks",
                F.expr(
                    "aggregate(toks, cast(array() as array<string>), "
                    "(acc, x) -> CASE WHEN size(acc) > 0 "
                    "AND element_at(acc, size(acc)) = pa AND x = pb "
                    "THEN concat(slice(acc, 1, size(acc) - 1), "
                    "array(concat(pa, pb))) "
                    "ELSE concat(acc, array(x)) END)"
                ),
            )
            .drop("pa", "pb")
            .localCheckpoint(eager=True)
        )
    return merges


@query("l3_bpe_learn")  # rows-only: iterative learning is not SQL-expressible
def l3_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: BPE merge learning — the first 10 rules learned from the
    documents corpus, as (rank, a, b) rows. Deterministic (count-desc
    pair-asc winner per round; fixed checkpointed procedure), so the
    driver's repeat-call probe holds; the learning invariants (first
    rule = most frequent pair, greedy non-overlap, determinism) are
    pinned by ``tests/test_bpe.py``."""
    merges = learn_bpe_merges(
        load_table(spark, sf_dir, "documents"), n_merges=10
    )
    from dst_spark_k8_lakehouse_spark.localrel import local_frame

    return local_frame(
        spark,
        [(r, a, b) for r, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )
