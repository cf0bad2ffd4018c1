"""Tests for the deterministic fixed-merges BPE layer (llm/bpe.py):
the reference tokenizer's invariants, the Spark mapInArrow stage
against the pure-Python reference, and the tokenizer-parameterized
chunk/pack variants."""

from __future__ import annotations

import re

from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.llm import bpe
from dst_spark_k8_lakehouse_spark.llm.textstats import BPE_REGEX
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=24))
def test_bpe_word_reassembles_and_terminates(word):
    toks = bpe.bpe_word(word)
    assert "".join(toks) == word
    assert all(toks), "empty token produced"
    # terminal: no adjacent pair may remain mergeable
    for a, b in zip(toks, toks[1:]):
        assert (a, b) not in bpe._RANKS


def test_bpe_word_known_merges():
    assert bpe.bpe_word("the") == ["the"]
    assert bpe.bpe_word("with") == ["with"]
    assert bpe.bpe_word("that") == ["that"]
    # chained merges: t+h→th, th+e→the, the+y→they
    assert bpe.bpe_word("they") == ["they"]
    # digits never match the (letter-only) merges table
    assert bpe.bpe_word("2024") == ["2", "0", "2", "4"]


def test_merges_table_is_well_formed():
    """Every merge must be reachable: each side is a single char or the
    product of an EARLIER rule — otherwise the rule is dead weight the
    oracle still pays for."""
    producible = set()
    for rank, (a, b) in enumerate(bpe.MERGES):
        for side in (a, b):
            assert len(side) == 1 or side in producible, (
                f"rule {rank} {a}+{b}: '{side}' not producible by any "
                "earlier rule"
            )
        producible.add(a + b)
    assert len(set(bpe.MERGES)) == len(bpe.MERGES), "duplicate rule"


def test_spark_counts_match_reference(spark, sf_dir):
    rows = (
        bpe.l3_bpe_token_count(spark, sf_dir)
        .join(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        .collect()
    )
    assert rows
    for r in rows[:200]:
        expected = sum(
            len(bpe.bpe_word(w))
            for w in re.findall(BPE_REGEX, (r.text or "").lower())
        )
        assert r.bpe_tokens == expected, r.doc_id


def test_chunk_bpe_reconstructs_token_stream(spark, sf_dir):
    """Non-overlapping prefixes of consecutive chunks must reassemble
    each document's full BPE token stream."""
    chunks = (
        bpe.l6_chunk_docs_bpe(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .collect()
    )
    assert chunks
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .collect()
    }
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        stream: list[str] = []
        for c in cs:
            toks = c.chunk_text.split(" ")
            assert len(toks) == c.n_tokens
            stream.extend(toks[: bpe.STRIDE])
        # the final chunk's tail beyond STRIDE is the stream's end
        tail = cs[-1].chunk_text.split(" ")[bpe.STRIDE :]
        stream.extend(tail)
        expected = bpe._bpe_doc(docs[doc_id])
        assert stream == expected, doc_id


def test_pack_bpe_offsets_are_consistent(spark, sf_dir):
    """pack_id/pack_offset must equal the running-sum layout of the
    per-doc counts within each source shard."""
    rows = bpe.l6_pack_sequences_bpe(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.pack_id == run // bpe.CTX, (src, r.doc_id)
            assert r.pack_offset == run % bpe.CTX, (src, r.doc_id)
            run += r.n_tokens


def test_bpe_queries_deterministic_on_repeat(spark, sf_dir):
    a = sorted(map(tuple, bpe.l3_bpe_token_count(spark, sf_dir).collect()))
    b = sorted(map(tuple, bpe.l3_bpe_token_count(spark, sf_dir).collect()))
    assert a == b


def test_learn_bpe_first_merge_is_most_frequent_pair(spark, sf_dir):
    """The first learned rule must equal the most frequent adjacent
    character pair, computed independently in pandas (count desc,
    pair asc tiebreak)."""
    import re
    from collections import Counter

    from dst_spark_k8_lakehouse_spark.llm.bpe import learn_bpe_merges
    from dst_spark_k8_lakehouse_spark.llm.textstats import BPE_REGEX
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    learned = learn_bpe_merges(docs, n_merges=3)
    assert len(learned) == 3

    pairs: Counter = Counter()
    for txt in docs.select("text").toPandas().text:
        for w in re.findall(BPE_REGEX, (txt or "").lower()):
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += 1
    expected = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert learned[0] == expected

    # repeat-call determinism (collect order, checkpoint, tiebreaks)
    assert learn_bpe_merges(docs, n_merges=3) == learned


def test_learn_bpe_merges_greedy_nonoverlapping(spark):
    """'aaaa' under pair (a,a) must merge to (aa, aa) — greedy
    left-to-right, non-overlapping (3 overlapping pairs collapse to
    2 merges) — and the next round must then learn (aa, aa)."""
    from dst_spark_k8_lakehouse_spark.llm.bpe import (
        bpe_token_counts,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    learned = learn_bpe_merges(docs, n_merges=2)
    assert learned == [("a", "a"), ("aa", "aa")]
    # applying the learned table: each 'aaaa' becomes one 'aaaa' token
    counts = {
        r.doc_id: r.bpe_tokens
        for r in bpe_token_counts(docs, ["doc_id"], merges=learned).collect()
    }
    assert counts == {1: 2, 2: 1}
