"""Kafka broker TCP client + loopback responder
(``sources/kafka_broker.py`` — S13's connection half).

The r10 codec tests (`test_kafka_wire.py`) pin the BYTES; these pin
the SOCKET: framing/correlation ids, partition discovery, Fetch v4
pagination against max_bytes, mid-log offsets, unknown-topic and
unsupported-api error paths, and the Spark face agreeing with the
broker-free segment source on identical data.
"""

from __future__ import annotations

import os
import socket
import struct

import pytest

from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb
from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
    encode_record_batch,
)


@pytest.fixture(scope="module")
def segment_root(tmp_path_factory):
    """Two partitions × 4 batches × 25 records, alternating
    none/gzip — same shape as the s13 fixture but hand-countable."""
    root = str(tmp_path_factory.mktemp("kb-segments"))
    for part in (0, 1):
        d = os.path.join(root, f"tp-{part}")
        os.makedirs(d)
        segs, off = [], 0
        for b in range(4):
            recs = [
                {"key": f"k{part}-{off + i}".encode(),
                 "value": f"v{part}-{off + i}".encode(),
                 "timestamp_ms": 1_700_000_000_000 + off + i}
                for i in range(25)
            ]
            segs.append(encode_record_batch(
                recs, base_offset=off,
                compression="gzip" if b % 2 else "none",
            ))
            off += 25
        with open(os.path.join(d, "00000000000000000000.log"),
                  "wb") as f:
            f.write(b"".join(segs))
    return root


@pytest.fixture(scope="module")
def responder(segment_root):
    with kb.SegmentResponder(segment_root) as r:
        yield r


def test_api_versions_handshake(responder):
    vs = kb.api_versions(responder.host, responder.port)
    assert vs[kb._API_FETCH] == (4, 4)
    assert vs[kb._API_METADATA] == (0, 0)


def test_metadata_discovers_partitions(responder):
    meta = kb.request_metadata(responder.host, responder.port, ["tp"])
    t = meta["topics"][0]
    assert t["name"] == "tp" and t["error"] == 0
    assert [p["partition"] for p in t["partitions"]] == [0, 1]
    # unknown topic: error 3 per partition-less topic entry, no crash
    missing = kb.request_metadata(
        responder.host, responder.port, ["nope"]
    )["topics"]
    assert missing[0]["error"] == kb._ERR_UNKNOWN_TOPIC


def _drain_all(*args, **kw) -> list[tuple]:
    return [r for page in kb.drain_partition(*args, **kw) for r in page]


def test_drain_full_partition(responder):
    rows = _drain_all(responder.host, responder.port, "tp", 0)
    assert len(rows) == 100
    assert [r[4] for r in rows] == list(range(100))  # offsets
    assert rows[0][0] == b"k0-0" and rows[99][1] == b"v0-99"


def test_drain_paginates_under_max_bytes(responder):
    # a cap smaller than two batches forces one Fetch per batch —
    # the result must still be exact and ordered
    rows = _drain_all(
        responder.host, responder.port, "tp", 1, max_bytes=400
    )
    assert [r[4] for r in rows] == list(range(100))
    assert rows[0][0] == b"k1-0"


def test_drain_from_mid_log_offset(responder):
    # offset 30 sits INSIDE batch 2 (25-49): the responder returns
    # the covering batch, the client trims records below the ask
    rows = _drain_all(
        responder.host, responder.port, "tp", 0, start_offset=30
    )
    assert [r[4] for r in rows] == list(range(30, 100))


def test_drain_streams_pages_with_bounded_memory(tmp_path, monkeypatch):
    """The 100-TB contract (VERDICT r11 item 2): drain_partition is a
    GENERATOR — rows reach the caller page by page, the full slice
    never exists as one list. Pinned by counting Fetch round trips: a
    one-batch-per-page cap over a 60-batch log must have made only ~1
    Fetch when the first page arrives, and ≥60 by exhaustion."""
    import types

    root = str(tmp_path / "seg")
    d = os.path.join(root, "fat-0")
    os.makedirs(d)
    segs, off = [], 0
    for _b in range(60):
        recs = [{"key": f"k{off + i}".encode(), "value": b"v" * 64,
                 "timestamp_ms": 1_700_000_000_000 + off + i}
                for i in range(10)]
        segs.append(encode_record_batch(recs, base_offset=off))
        off += 10
    with open(os.path.join(d, "00000000000000000000.log"), "wb") as f:
        f.write(b"".join(segs))

    fetches = {"n": 0}
    real_fetch = kb.fetch

    def counting_fetch(*a, **k):
        fetches["n"] += 1
        return real_fetch(*a, **k)

    monkeypatch.setattr(kb, "fetch", counting_fetch)
    with kb.SegmentResponder(root) as r:
        gen = kb.drain_partition(r.host, r.port, "fat", 0,
                                 max_bytes=1)  # one batch per page
        assert isinstance(gen, types.GeneratorType)
        first = next(gen)
        assert [x[4] for x in first] == list(range(10))
        # only the first page's Fetch has happened — the remaining 59
        # pages are still on the wire, NOT buffered in memory
        assert fetches["n"] <= 2
        rest = [x for page in gen for x in page]
        assert fetches["n"] >= 60
        assert [x[4] for x in rest] == list(range(10, 600))


def test_unsupported_api_is_a_loud_error(responder):
    with socket.create_connection(
        (responder.host, responder.port), timeout=5
    ) as sock:
        r = kb._roundtrip(sock, 13, 0, 42, b"")  # LeaveGroup: never served
        assert r.i16() == kb._ERR_UNSUPPORTED_VERSION
        # served KEYS at unserved VERSIONS refuse the same way
        r = kb._roundtrip(sock, kb._API_LIST_OFFSETS, 0, 43, b"")
        assert r.i16() == kb._ERR_UNSUPPORTED_VERSION
        r = kb._roundtrip(sock, kb._API_PRODUCE, 7, 44, b"")
        assert r.i16() == kb._ERR_UNSUPPORTED_VERSION
    # a MALFORMED request at a served (key, version) — Produce v3
    # with an empty body — drops that connection but must not kill
    # the serve thread: the next connection still gets answers
    with socket.create_connection(
        (responder.host, responder.port), timeout=5
    ) as bad:
        with pytest.raises((ConnectionError, OSError)):
            kb._roundtrip(bad, kb._API_PRODUCE, 3, 45, b"")
    vs = kb.api_versions(responder.host, responder.port)
    assert vs[kb._API_PRODUCE] == (3, 3)


def test_connection_reuse_echoes_each_correlation_id(responder):
    # several sequential requests on ONE socket: each response must
    # carry ITS request's correlation id (the client raises on any
    # mismatch inside _roundtrip)
    with socket.create_connection(
        (responder.host, responder.port), timeout=5
    ) as sock:
        for corr in (7, 99, 12345):
            r = kb._roundtrip(sock, kb._API_VERSIONS, 0, corr, b"")
            assert r.i16() == kb._ERR_NONE


def test_read_kafka_topic_matches_segment_source(
    spark, segment_root, responder
):
    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        kafka_segment_source,
    )

    over_tcp = kb.read_kafka_topic(
        spark, responder.host, responder.port, "tp",
        max_bytes=512,  # several pages per partition
    ).toPandas().sort_values(["partition", "offset"]).reset_index(
        drop=True
    )
    from_files = kafka_segment_source(
        spark, segment_root
    ).toPandas().sort_values(["partition", "offset"]).reset_index(
        drop=True
    )
    assert over_tcp.equals(from_files)
    assert len(over_tcp) == 200


def test_read_kafka_topic_unknown_topic_raises(spark, responder):
    with pytest.raises(ValueError, match="unknown"):
        kb.read_kafka_topic(
            spark, responder.host, responder.port, "absent"
        )


def test_list_offsets_sentinels(responder):
    lo = kb.list_offsets(responder.host, responder.port, "tp", [0, 1],
                         kb.EARLIEST)
    hi = kb.list_offsets(responder.host, responder.port, "tp", [0, 1],
                         kb.LATEST)
    assert lo == {0: 0, 1: 0}
    assert hi == {0: 100, 1: 100}


def test_list_offsets_timestamp_lookup(responder):
    # fixture record i has timestamp 1_700_000_000_000 + i: the
    # contract returns the FIRST offset with ts >= target
    base = 1_700_000_000_000
    got = kb.list_offsets(responder.host, responder.port, "tp", [0],
                          base + 30)
    assert got == {0: 30}
    # a timestamp between records rounds UP to the next record
    assert kb.list_offsets(
        responder.host, responder.port, "tp", [0], base
    ) == {0: 0}
    # beyond every record: -1 (the wire contract's "nothing
    # qualifies"; consumers anchor at the end)
    assert kb.list_offsets(
        responder.host, responder.port, "tp", [0], base + 10_000
    ) == {0: -1}


def test_kafka_tcp_batch_format(spark, segment_root, responder):
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source
    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        kafka_segment_source,
    )

    kafka_tcp_source.register(spark)
    got = (
        spark.read.format("kafka_tcp")
        .option("host", responder.host)
        .option("port", responder.port)
        .option("topic", "tp")
        .option("maxbytes", 512)
        .load()
        .toPandas()
        .sort_values(["partition", "offset"]).reset_index(drop=True)
    )
    want = kafka_segment_source(spark, segment_root).toPandas() \
        .sort_values(["partition", "offset"]).reset_index(drop=True)
    assert got.equals(want)
    # startingoffsets=latest → empty batch (anchor == high watermark)
    empty = (
        spark.read.format("kafka_tcp")
        .option("host", responder.host)
        .option("port", responder.port)
        .option("topic", "tp")
        .option("startingoffsets", "latest")
        .load()
    )
    assert empty.count() == 0


def test_kafka_tcp_stream_is_incremental(spark, tmp_path):
    """Two availableNow drains through ONE checkpoint: the second
    sees only the batch appended between them — the offset dict in
    the checkpoint is doing its job."""
    import os as _os

    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    root = str(tmp_path / "seg")
    d = _os.path.join(root, "inc-0")
    _os.makedirs(d)
    log = _os.path.join(d, "00000000000000000000.log")

    def _append(base, n):
        recs = [{"key": f"k{base + i}".encode(),
                 "value": f"v{base + i}".encode(),
                 "timestamp_ms": 1_700_000_000_000 + base + i}
                for i in range(n)]
        with open(log, "ab") as f:
            f.write(encode_record_batch(recs, base_offset=base))

    _append(0, 40)
    kafka_tcp_source.register(spark)
    with kb.SegmentResponder(root) as r:
        def drain():
            q = (
                spark.readStream.format("kafka_tcp")
                .option("host", r.host)
                .option("port", r.port)
                .option("topic", "inc")
                .load()
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "cp"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(str(tmp_path / "out"))

        first = drain()
        assert first.count() == 40
        _append(40, 15)  # arrives between micro-batch runs
        second = drain()
        assert second.count() == 55  # 40 + ONLY the 15 new
        offs = sorted(
            x.offset for x in second.select("offset").collect()
        )
        assert offs == list(range(55))


def test_read_anchors_on_retention_trimmed_log(spark, tmp_path):
    """A log whose start is nonzero (retention trimmed the head):
    read_kafka_topic must anchor via ListOffsets(EARLIEST) — an
    explicit ask below the log start gets the real broker's
    OFFSET_OUT_OF_RANGE, which the responder now enforces."""
    root = str(tmp_path / "seg")
    d = os.path.join(root, "trim-0")
    os.makedirs(d)
    recs = [{"key": f"k{40 + i}".encode(), "value": b"v",
             "timestamp_ms": 1_700_000_000_000 + i} for i in range(20)]
    with open(os.path.join(d, "00000000000000000040.log"), "wb") as f:
        f.write(encode_record_batch(recs, base_offset=40))
    with kb.SegmentResponder(root) as r:
        assert kb.list_offsets(r.host, r.port, "trim", [0],
                               kb.EARLIEST) == {0: 40}
        rows = kb.read_kafka_topic(
            spark, r.host, r.port, "trim"
        ).toPandas().sort_values("offset")
        assert rows["offset"].tolist() == list(range(40, 60))
        # the pre-fix default (hardcoded start 0) is now a loud error
        with pytest.raises(Exception, match="error 1"):
            kb.read_kafka_topic(
                spark, r.host, r.port, "trim", start_offset=0
            ).count()


def test_kafka_tcp_stream_discovers_new_partitions(spark, tmp_path):
    """A topic that gains a partition between micro-batches: the
    stream reader re-discovers at latestOffset and anchors the new
    partition at EARLIEST (nonzero log start, so a 0 anchor would be
    OFFSET_OUT_OF_RANGE) — pre-r12 it was silently never read."""
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    root = str(tmp_path / "seg")
    d0 = os.path.join(root, "grow-0")
    os.makedirs(d0)

    def _log(d, base, n):
        recs = [{"key": f"k{base + i}".encode(), "value": b"v",
                 "timestamp_ms": 1_700_000_000_000 + base + i}
                for i in range(n)]
        with open(os.path.join(d, f"{base:020d}.log"), "wb") as f:
            f.write(encode_record_batch(recs, base_offset=base))

    _log(d0, 0, 20)
    kafka_tcp_source.register(spark)
    with kb.SegmentResponder(root) as r:
        def drain():
            q = (
                spark.readStream.format("kafka_tcp")
                .option("host", r.host)
                .option("port", r.port)
                .option("topic", "grow")
                .load()
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "cp"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(str(tmp_path / "out"))

        assert drain().count() == 20
        # partition 1 appears mid-stream, log trimmed to start at 5
        d1 = os.path.join(root, "grow-1")
        os.makedirs(d1)
        _log(d1, 5, 15)
        r.partitions[("grow", 1)] = os.path.join(d1, f"{5:020d}.log")
        second = drain().toPandas()
        assert len(second) == 35  # 20 + the NEW partition's 15
        p1 = second[second["partition"] == 1]["offset"]
        assert sorted(p1.tolist()) == list(range(5, 20))


def test_kafka_tcp_batch_starting_timestamp(spark, responder):
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    base = 1_700_000_000_000
    got = (
        spark.read.format("kafka_tcp")
        .option("host", responder.host)
        .option("port", responder.port)
        .option("topic", "tp")
        .option("startingtimestamp", base + 75)
        .load()
        .toPandas()
    )
    # both partitions carry offsets 0-99 with ts = base + offset:
    # the batch must hold exactly the ts >= base+75 suffix of each
    assert len(got) == 50
    assert got.groupby("partition")["offset"].min().tolist() == [75, 75]
    # a timestamp past every record anchors at the end: empty batch
    empty = (
        spark.read.format("kafka_tcp")
        .option("host", responder.host)
        .option("port", responder.port)
        .option("topic", "tp")
        .option("startingtimestamp", base + 10_000)
        .load()
    )
    assert empty.count() == 0


def test_produce_assigns_offsets_and_roundtrips(tmp_path):
    """Produce v3 → Fetch v4 round trip on an auto-created topic:
    base offsets are broker-assigned (each batch continues the log,
    whatever base the producer sent), CRC survives the baseOffset
    rewrite (drain verifies every batch's CRC), both codecs land."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    with kb.SegmentResponder(root) as r:
        recs = lambda lo, n: [  # noqa: E731
            {"key": f"k{lo + i}".encode(), "value": f"v{lo + i}".encode(),
             "timestamp_ms": 1_700_000_000_000 + lo + i}
            for i in range(n)
        ]
        b0 = kb.produce(r.host, r.port, "fresh", 0, recs(0, 30))
        b1 = kb.produce(r.host, r.port, "fresh", 0, recs(30, 20),
                        compression="gzip")
        assert (b0, b1) == (0, 30)
        hwm = kb.list_offsets(r.host, r.port, "fresh", [0], kb.LATEST)
        assert hwm == {0: 50}
        rows = _drain_all(r.host, r.port, "fresh", 0)
        assert [x[4] for x in rows] == list(range(50))
        assert rows[0][0] == b"k0" and rows[49][1] == b"v49"
        # metadata discovers the auto-created topic
        meta = kb.request_metadata(r.host, r.port, ["fresh"])
        assert meta["topics"][0]["error"] == 0


def test_produce_appends_after_existing_fixture(segment_root, tmp_path):
    """Producing into a partition that already holds fixture batches
    anchors at the existing high watermark — the broker contract.
    (Own COPY of the module fixture: produce mutates the log.)"""
    import shutil

    root = str(tmp_path / "copy")
    shutil.copytree(segment_root, root)
    with kb.SegmentResponder(root) as r:
        base = kb.produce(
            r.host, r.port, "tp", 0,
            [{"key": b"new", "value": b"row",
              "timestamp_ms": 1_700_000_001_000}],
        )
        assert base == 100  # the module fixture holds offsets 0-99
        rows = _drain_all(r.host, r.port, "tp", 0, start_offset=100)
        assert [(x[0], x[1], x[4]) for x in rows] == [
            (b"new", b"row", 100)
        ]


def test_write_kafka_topic_distributed_face(spark, tmp_path):
    """The executor-side write: a frame with a partition column fans
    out one producing socket per partition, acks account for every
    row, and the drained topic equals the input."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    from pyspark.sql import functions as F

    df = spark.range(700).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.concat(F.lit("val-"), F.col("id")).cast("binary").alias("value"),
        (F.col("id") % 3).cast("int").alias("partition"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("timestamp_ms"),
    )
    with kb.SegmentResponder(root) as r:
        acks = kb.write_kafka_topic(
            df, r.host, r.port, "bulk", records_per_batch=100
        ).toPandas()
        assert int(acks["n_records"].sum()) == 700
        hwm = kb.list_offsets(r.host, r.port, "bulk", [0, 1, 2],
                              kb.LATEST)
        assert sum(hwm.values()) == 700
        back = kb.read_kafka_topic(
            spark, r.host, r.port, "bulk"
        ).toPandas()
        assert len(back) == 700
        got = sorted(
            (int(k.decode()), v.decode())
            for k, v in zip(back["key"], back["value"])
        )
        assert got == [(i, f"val-{i}") for i in range(700)]


def test_kafka_tcp_write_format_batch(spark, tmp_path):
    """df.write.format('kafka_tcp').mode('append'): rows land with
    broker-assigned offsets and drain back equal; overwrite refuses
    (a log cannot be overwritten)."""
    from pyspark.sql import functions as F

    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    root = str(tmp_path / "seg")
    os.makedirs(root)
    df = spark.range(300).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit("m-"), F.col("id")).alias("value"),
        (F.col("id") % 2).cast("int").alias("partition"),
    )
    with kb.SegmentResponder(root) as r:
        (
            df.write.format("kafka_tcp")
            .option("host", r.host)
            .option("port", r.port)
            .option("topic", "sunk")
            .option("batchrecords", 64)
            .mode("append")
            .save()
        )
        back = kb.read_kafka_topic(
            spark, r.host, r.port, "sunk"
        ).toPandas()
        assert len(back) == 300
        got = sorted(
            (int(k.decode()), v.decode())
            for k, v in zip(back["key"], back["value"])
        )
        assert got == [(i, f"m-{i}") for i in range(300)]
        with pytest.raises(Exception, match="append-only"):
            (
                df.write.format("kafka_tcp")
                .option("host", r.host)
                .option("port", r.port)
                .option("topic", "sunk")
                .mode("overwrite")
                .save()
            )


def test_produce_multi_batch_record_set(tmp_path):
    """A Produce request whose record_set holds TWO RecordBatch v2
    frames (the protocol allows it): the peer rewrites EACH batch's
    base offset to continue the log, returns the first, and the
    drained log is exact with every CRC verified."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    recs = lambda lo, n: [  # noqa: E731
        {"key": f"k{lo + i}".encode(), "value": b"v",
         "timestamp_ms": 1_700_000_000_000 + lo + i}
        for i in range(n)
    ]
    two = (encode_record_batch(recs(0, 7))
           + encode_record_batch(recs(0, 5), compression="gzip"))
    with kb.SegmentResponder(root) as r:
        import socket as _socket

        with _socket.create_connection((r.host, r.port), timeout=5) as s:
            base = kb.produce_on(s, "mb", 0, two)
            assert base == 0
            base2 = kb.produce_on(s, "mb", 0, two)
            assert base2 == 12  # both batches of request 1 counted
        rows = _drain_all(r.host, r.port, "mb", 0)
        assert [x[4] for x in rows] == list(range(24))


def test_produce_acks_zero_refused():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fire-and-forget"):
        kb.produce_on(None, "t", 0, b"", acks=0)


def test_write_kafka_topic_empty_frame(spark, tmp_path):
    """Zero rows: an empty ack frame with the right schema, no
    produce requests, topic untouched — pins the Arrow empty-batch
    path through mapInPandas."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "seg")
    os.makedirs(os.path.join(root, "t-0"))
    df = spark.range(0).select(
        F.col("id").cast("string").cast("binary").alias("value"),
        (F.col("id") % 2).cast("int").alias("partition"),
    )
    with kb.SegmentResponder(root) as r:
        acks = kb.write_kafka_topic(df, r.host, r.port, "t").toPandas()
        assert len(acks) == 0
        assert list(acks.columns) == ["partition", "base_offset",
                                      "n_records"]


def test_kafka_tcp_write_requires_value(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    root = str(tmp_path / "seg")
    os.makedirs(root)
    with kb.SegmentResponder(root) as r:
        with pytest.raises(Exception, match="value column"):
            (
                spark.range(3).write.format("kafka_tcp")
                .option("host", r.host)
                .option("port", r.port)
                .option("topic", "x")
                .mode("append")
                .save()
            )


def test_slice_and_timestamp_lookup_properties(tmp_path):
    """Property check over random segment shapes: every (offset,
    max_bytes) slice returns whole batches covering the ask and makes
    progress below the high watermark; timestamp lookup agrees with a
    brute-force scan of the decoded records."""
    import random

    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        decode_record_batches,
    )

    rng = random.Random(11)
    for trial in range(8):
        d = tmp_path / f"seg{trial}"
        d.mkdir()
        path = str(d / "00000000000000000000.log")
        base_ts = 1_600_000_000_000
        off = rng.randrange(0, 5)
        first_off = off
        recs_all = []
        with open(path, "wb") as f:
            for _b in range(rng.randrange(1, 6)):
                n = rng.randrange(1, 30)
                recs = [
                    {"key": str(off + i).encode(),
                     "value": b"v",
                     # non-decreasing but duplicated timestamps
                     "timestamp_ms": base_ts + (off + i) // 2}
                    for i in range(n)
                ]
                f.write(encode_record_batch(
                    recs, base_offset=off,
                    compression=rng.choice(["none", "gzip"]),
                ))
                recs_all += [(off + i, base_ts + (off + i) // 2)
                             for i in range(n)]
                off += n
        hwm_expected = off
        kb._SPAN_CACHE.clear()
        # slices: any ask below hwm yields covering whole batches
        for _ in range(20):
            ask = rng.randrange(first_off, hwm_expected + 3)
            mb = rng.choice([1, 100, 1000, 1 << 20])
            hwm, blob = kb._slice_segment(path, ask, mb)
            assert hwm == hwm_expected
            if ask >= hwm:
                continue
            got = [
                r["offset"]
                for b in decode_record_batches(blob)
                for r in b["records"]
            ]
            assert got, f"no progress at ask={ask}"
            assert min(got) <= ask  # covering batch included
            # contiguity of the returned prefix
            assert got == list(range(min(got), max(got) + 1))
        # timestamp lookup == brute force first-qualifying offset
        for _ in range(10):
            ts = base_ts + rng.randrange(-2, (hwm_expected // 2) + 3)
            want = min(
                (o for o, t in recs_all if t >= ts), default=-1
            )
            assert kb._offset_for_timestamp(path, ts) == want


def test_produce_rejects_corrupt_record_set(tmp_path):
    """ADVICE r12: the responder must validate ON PRODUCE (bounds +
    magic + CRC-32C) and answer CORRUPT_MESSAGE (2) instead of
    appending — a corrupt-but-parseable set written to the segment
    would poison every later Fetch of the partition."""
    import socket as _socket
    import struct as _struct

    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        encode_record_batch,
    )

    root = str(tmp_path / "seg")
    os.makedirs(root)
    good = encode_record_batch(
        [{"key": b"k", "value": b"v", "timestamp_ms": 1}]
    )
    with kb.SegmentResponder(root) as r:
        # a clean produce first, so the topic exists
        with _socket.create_connection((r.host, r.port), timeout=10) as s:
            assert kb.produce_on(s, "t", 0, good) == 0
            # flip one payload byte AFTER the CRC field: CRC mismatch
            bad = bytearray(good)
            bad[-1] ^= 0xFF
            with pytest.raises(ValueError, match="Produce error 2"):
                kb.produce_on(s, "t", 0, bytes(bad), corr_id=7)
        # bounds violation: batch_len says more bytes than sent
        trunc = bytearray(good)
        _struct.pack_into(">i", trunc, 8, len(good) + 100)
        with _socket.create_connection((r.host, r.port), timeout=10) as s:
            with pytest.raises(ValueError, match="Produce error 2"):
                kb.produce_on(s, "t", 0, bytes(trunc), corr_id=8)
        # nothing appended, the partition still serves cleanly
        assert kb.list_offsets(r.host, r.port, "t", [0], kb.LATEST) == {
            0: 1
        }
        rows = _drain_all(r.host, r.port, "t", 0)
        assert [(x[0], x[1]) for x in rows] == [(b"k", b"v")]


def test_write_kafka_topic_null_value_is_tombstone(spark, tmp_path):
    """ADVICE r12: a null value cell must produce a TOMBSTONE
    (value=None on the wire), never b'None'; a null/NaN timestamp_ms
    must not crash the int() coercion."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    df = spark.createDataFrame(
        [
            (b"a", b"live", 0, 1_700_000_000_000),
            (b"b", None, 0, None),  # tombstone + null ts
            (None, b"keyless", 0, 1_700_000_000_002),
        ],
        "key binary, value binary, partition int, timestamp_ms long",
    )
    with kb.SegmentResponder(root) as r:
        acks = kb.write_kafka_topic(
            df.coalesce(1), r.host, r.port, "tomb"
        ).toPandas()
        assert int(acks["n_records"].sum()) == 3
        rows = _drain_all(r.host, r.port, "tomb", 0)
        by_key = {x[0]: x[1] for x in rows}
        assert by_key[b"a"] == b"live"
        assert by_key[b"b"] is None  # tombstone survived the wire
        assert by_key[None] == b"keyless"


def test_kafka_tcp_write_null_value_is_tombstone(spark, tmp_path):
    """The DataSource write face: same tombstone contract as
    write_kafka_topic (a null value must not become b'')."""
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    root = str(tmp_path / "seg")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(b"a", b"live", 0), (b"b", None, 0)],
        "key binary, value binary, partition int",
    )
    with kb.SegmentResponder(root) as r:
        (
            df.coalesce(1).write.format("kafka_tcp").mode("append")
            .option("host", r.host).option("port", r.port)
            .option("topic", "tomb2").save()
        )
        rows = _drain_all(r.host, r.port, "tomb2", 0)
        by_key = {x[0]: x[1] for x in rows}
        assert by_key == {b"a": b"live", b"b": None}


def test_include_headers_round_trip(spark, tmp_path):
    """r13 includeHeaders parity: headers ride the wire through
    produce and come back typed through read_kafka_topic and the
    kafka_tcp DataSource — including a null-valued header — and the
    schema grows the column ONLY when asked (stock-connector
    contract)."""
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    root = str(tmp_path / "seg")
    os.makedirs(root)
    with kb.SegmentResponder(root) as r:
        kb.produce(
            r.host, r.port, "hdr", 0,
            [
                {"key": b"a", "value": b"v1", "timestamp_ms": 1,
                 "headers": [("h1", b"x"), ("h2", None)]},
                {"key": b"b", "value": b"v2", "timestamp_ms": 2,
                 "headers": []},
            ],
        )
        # default: no headers column (stock parity)
        plain = kb.read_kafka_topic(spark, r.host, r.port, "hdr")
        assert "headers" not in plain.columns
        got = kb.read_kafka_topic(
            spark, r.host, r.port, "hdr", include_headers=True
        ).toPandas().sort_values("offset")
        assert list(got.columns)[-1] == "headers"
        h0 = list(got["headers"].iloc[0])
        assert (h0[0]["key"], bytes(h0[0]["value"])) == ("h1", b"x")
        assert h0[1]["key"] == "h2" and h0[1]["value"] is None
        assert list(got["headers"].iloc[1]) == []
        # the DataSource face: same column behind the option
        ds = (
            spark.read.format("kafka_tcp")
            .option("host", r.host).option("port", r.port)
            .option("topic", "hdr")
            .option("includeHeaders", "true").load()
        ).toPandas().sort_values("offset")
        assert list(ds.columns)[-1] == "headers"
        d0 = list(ds["headers"].iloc[0])
        assert (d0[0]["key"], bytes(d0[0]["value"])) == ("h1", b"x")
        assert d0[1]["value"] is None
        no_h = (
            spark.read.format("kafka_tcp")
            .option("host", r.host).option("port", r.port)
            .option("topic", "hdr").load()
        )
        assert "headers" not in no_h.columns


def test_write_faces_carry_headers(spark, tmp_path):
    """Both write faces forward a headers column to the wire."""
    from dst_spark_k8_lakehouse_spark.sources import kafka_tcp_source

    kafka_tcp_source.register(spark)
    root = str(tmp_path / "seg")
    os.makedirs(root)
    df = spark.sql(
        "SELECT CAST('k' AS BINARY) AS key, CAST('v' AS BINARY) AS "
        "value, 0 AS partition, array(struct('t' AS key, "
        "CAST('w' AS BINARY) AS value)) AS headers"
    )
    with kb.SegmentResponder(root) as r:
        kb.write_kafka_topic(df.coalesce(1), r.host, r.port, "w1") \
            .collect()
        rows = _drain_all(r.host, r.port, "w1", 0)
        # drain via include_headers to see them
        pages = list(kb.drain_partition(
            r.host, r.port, "w1", 0, include_headers=True
        ))
        hdrs = pages[0][0][7]
        assert hdrs == [{"key": "t", "value": b"w"}]
        (
            df.coalesce(1).write.format("kafka_tcp").mode("append")
            .option("host", r.host).option("port", r.port)
            .option("topic", "w2").save()
        )
        pages = list(kb.drain_partition(
            r.host, r.port, "w2", 0, include_headers=True
        ))
        assert pages[0][0][7] == [{"key": "t", "value": b"w"}]


def test_consumer_group_offset_round_trip(tmp_path):
    """r13 (VERDICT r12 item 4 stretch): FindCoordinator v0 /
    OffsetCommit v2 / OffsetFetch v1 — external-consumer offset
    bookkeeping against the responder. Commit per-partition offsets
    for a group, fetch them back exactly; an uncommitted partition
    and an unknown group answer -1 (the wire contract); a re-commit
    overwrites; a second group is independent."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    with kb.SegmentResponder(root) as r:
        # the coordinator for any group is the single-node peer itself
        assert kb.find_coordinator(r.host, r.port, "g1") == (
            r.host, r.port
        )
        kb.produce(
            r.host, r.port, "t", 0,
            [{"key": b"k", "value": b"v", "timestamp_ms": 1}],
        )
        kb.offset_commit(
            r.host, r.port, "g1", "t", {0: 1, 3: 42}, metadata="m"
        )
        got = kb.offset_fetch(r.host, r.port, "g1", "t", [0, 1, 3])
        assert got == {0: 1, 1: -1, 3: 42}
        # unknown group: nothing committed anywhere
        assert kb.offset_fetch(r.host, r.port, "gX", "t", [0]) == {0: -1}
        # re-commit overwrites; a second group stays independent
        kb.offset_commit(r.host, r.port, "g1", "t", {0: 7})
        kb.offset_commit(r.host, r.port, "g2", "t", {0: 99})
        assert kb.offset_fetch(r.host, r.port, "g1", "t", [0]) == {0: 7}
        assert kb.offset_fetch(r.host, r.port, "g2", "t", [0]) == {0: 99}


def test_consumer_group_resume_pattern(spark, tmp_path):
    """The external-consumer resume shape the coordinator surface
    exists for: read from committed offsets (anchoring uncommitted
    partitions at EARLIEST), commit the high watermark, and a second
    pass sees ONLY what arrived in between."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    with kb.SegmentResponder(root) as r:
        recs = lambda lo, n: [  # noqa: E731
            {"key": f"{lo + i}".encode(), "value": b"x",
             "timestamp_ms": 1 + lo + i}
            for i in range(n)
        ]
        kb.produce(r.host, r.port, "t", 0, recs(0, 10))
        committed = kb.offset_fetch(r.host, r.port, "grp", "t", [0])
        start = (
            committed[0] if committed[0] >= 0
            else kb.list_offsets(r.host, r.port, "t", [0],
                                 kb.EARLIEST)[0]
        )
        first = _drain_all(r.host, r.port, "t", 0, start_offset=start)
        assert len(first) == 10
        kb.offset_commit(
            r.host, r.port, "grp", "t",
            {0: max(x[4] for x in first) + 1},
        )
        kb.produce(r.host, r.port, "t", 0, recs(10, 5))
        committed = kb.offset_fetch(r.host, r.port, "grp", "t", [0])
        assert committed[0] == 10
        second = _drain_all(
            r.host, r.port, "t", 0, start_offset=committed[0]
        )
        assert [int(x[0].decode()) for x in second] == list(
            range(10, 15)
        )


def test_read_kafka_topic_group_anchored(spark, tmp_path):
    """read_kafka_topic(group_id=…): partitions anchor at the group's
    committed offsets, EARLIEST fallback for uncommitted ones, and
    commit_read_position records the high watermark — the distributed
    face of the coordinator round trip."""
    root = str(tmp_path / "seg")
    os.makedirs(root)
    from pyspark.sql import functions as F

    def wave(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").cast("string").cast("binary").alias("key"),
            F.concat(F.lit("v-"), F.col("id")).cast("binary").alias("value"),
            (F.col("id") % 2).cast("int").alias("partition"),
        )

    with kb.SegmentResponder(root) as r:
        kb.write_kafka_topic(wave(0, 40), r.host, r.port, "t").collect()
        first = kb.read_kafka_topic(
            spark, r.host, r.port, "t", group_id="g"
        ).toPandas()
        assert len(first) == 40  # nothing committed -> EARLIEST
        positions = kb.consumed_positions(first)
        assert sum(positions.values()) == 40
        # records produced AFTER the drain but BEFORE the commit must
        # NOT be skipped: the commit records what was CONSUMED, so the
        # next read picks the late rows up (at-least-once, never
        # at-most-once)
        kb.write_kafka_topic(wave(100, 15), r.host, r.port, "t").collect()
        kb.commit_read_position(r.host, r.port, "g", "t", positions)
        second = kb.read_kafka_topic(
            spark, r.host, r.port, "t", group_id="g"
        ).toPandas()
        assert sorted(int(k.decode()) for k in second["key"]) == list(
            range(100, 115)
        )
        # another group is unaffected: still reads everything
        allrows = kb.read_kafka_topic(
            spark, r.host, r.port, "t", group_id="g2"
        ).toPandas()
        assert len(allrows) == 55
        with pytest.raises(ValueError, match="not both"):
            kb.read_kafka_topic(
                spark, r.host, r.port, "t", start_offset=0, group_id="g"
            )
