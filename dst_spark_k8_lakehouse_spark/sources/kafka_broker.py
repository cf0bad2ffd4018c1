"""Kafka broker TCP protocol — the S13 connection half, jar-free.

``sources/kafka_wire.py`` (r10) made the RecordBatch v2 BYTES real;
this module (r11, VERDICT r10 item 6) makes the SOCKET real: a
pure-stdlib client for the request/response shapes a consumer
needs from Kafka's public wire protocol (kafka.apache.org/protocol —
size-framed requests, big-endian primitives, int16-length strings,
int32-count arrays):

- **ApiVersions v0** (api_key 18) — handshake/feature probe;
- **Metadata v0** (api_key 3) — topic → partition/leader discovery;
- **Fetch v4** (api_key 1) — the first Fetch version that returns
  magic=2 RecordBatch frames, which ``kafka_wire.decode_record_batches``
  already decodes (CRC-32C verified, gzip handled).

- **ListOffsets v1** (api_key 2) — offset anchoring: EARLIEST /
  LATEST sentinels plus timestamp lookup, so consumers never guess a
  start offset (served by the responder, used by both the batch and
  stream faces).

``read_kafka_topic`` is the Spark face: Metadata on the driver
discovers partitions and ListOffsets(EARLIEST) anchors each start,
then ONE TASK PER PARTITION opens its own socket on the executor and
drains ``[earliest, high_watermark)`` via repeated Fetch — the same
per-partition-consumer topology the real ``format("kafka")`` source
runs, so at cluster scale the connection fan-out is executor-side and
the driver never touches record bytes. ``drain_partition`` is a
GENERATOR of per-Fetch-page row chunks (r12): a partition slice never
exists as one Python list in an executor, so a tens-of-GB partition
streams through bounded memory exactly like the stock connector.

- **Produce v3** (api_key 0, r12) — the write half: one RecordBatch
  v2 per request, base offsets assigned by the peer (the batch
  header's baseOffset is rewritten on append — CRC-safe, the v2 CRC
  covers attributes onward). ``write_kafka_topic`` is the
  distributed face: every task produces its own rows over one
  socket — shuffle-free, the stock sink's shape.

``SegmentResponder`` is the in-process loopback peer: a thread
serving those shapes straight from on-disk segment files (the
``kafka_wire`` fixtures), appending produced batches with broker
offset assignment and auto-creating unknown topic-partitions the way
real brokers do by default. It exists because this container has no
broker (env gap re-verified each round) — the responder proves the
codec + client against a REAL socket round-trip: framing, correlation
ids, partial-batch cuts at ``max_bytes``, high-watermark pagination,
produce-then-fetch byte conformance. It is a test/dev peer, not a
broker (no consumer groups, no txns, no ACLs — every unsupported
api_key is answered with error 35 UNSUPPORTED_VERSION rather than
garbage).

No reference parity line: the reference platform consumes Kafka via
the stock Spark connector; this surface is the jar-free analog.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any

_API_PRODUCE = 0
_API_FETCH = 1
_API_LIST_OFFSETS = 2
_API_METADATA = 3
_API_OFFSET_COMMIT = 8
_API_OFFSET_FETCH = 9
_API_FIND_COORDINATOR = 10
_API_VERSIONS = 18

EARLIEST = -2  # ListOffsets timestamp sentinels (public protocol)
LATEST = -1

_ERR_NONE = 0
_ERR_OFFSET_OUT_OF_RANGE = 1
_ERR_CORRUPT_MESSAGE = 2
_ERR_UNKNOWN_TOPIC = 3
_ERR_UNSUPPORTED_VERSION = 35


# ------------------------------------------------------------ primitives


class _Writer:
    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def i8(self, v: int) -> "_Writer":
        self.parts.append(struct.pack(">b", v))
        return self

    def i16(self, v: int) -> "_Writer":
        self.parts.append(struct.pack(">h", v))
        return self

    def i32(self, v: int) -> "_Writer":
        self.parts.append(struct.pack(">i", v))
        return self

    def i64(self, v: int) -> "_Writer":
        self.parts.append(struct.pack(">q", v))
        return self

    def string(self, s: str | None) -> "_Writer":
        if s is None:
            return self.i16(-1)
        b = s.encode("utf-8")
        self.i16(len(b))
        self.parts.append(b)
        return self

    def nbytes(self, b: bytes | None) -> "_Writer":
        if b is None:
            return self.i32(-1)
        self.i32(len(b))
        self.parts.append(b)
        return self

    def done(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def _unpack(self, fmt: str, size: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def i8(self) -> int:
        return self._unpack(">b", 1)

    def i16(self) -> int:
        return self._unpack(">h", 2)

    def i32(self) -> int:
        return self._unpack(">i", 4)

    def i64(self) -> int:
        return self._unpack(">q", 8)

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        s = self.buf[self.pos:self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def nbytes(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("Kafka peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _roundtrip(
    sock: socket.socket,
    api_key: int,
    api_version: int,
    corr_id: int,
    body: bytes,
    client_id: str = "dst-spark-k8-lakehouse",
) -> _Reader:
    header = (
        _Writer().i16(api_key).i16(api_version).i32(corr_id)
        .string(client_id).done()
    )
    frame = header + body
    sock.sendall(struct.pack(">i", len(frame)) + frame)
    size = struct.unpack(">i", _recv_exact(sock, 4))[0]
    resp = _Reader(_recv_exact(sock, size))
    got = resp.i32()
    if got != corr_id:
        raise ValueError(
            f"correlation id mismatch: sent {corr_id}, got {got}"
        )
    return resp


# --------------------------------------------------------------- client


def api_versions(host: str, port: int) -> dict[int, tuple[int, int]]:
    """ApiVersions v0 handshake: {api_key: (min, max)}."""
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_VERSIONS, 0, 1, b"")
        err = r.i16()
        if err:
            raise ValueError(f"ApiVersions error {err}")
        out = {}
        for _ in range(r.i32()):
            k, lo, hi = r.i16(), r.i16(), r.i16()
            out[k] = (lo, hi)
        return out


def request_metadata(
    host: str, port: int, topics: list[str] | None = None
) -> dict[str, Any]:
    """Metadata v0: brokers + topic → partitions/leaders. ``topics``
    empty/None asks for every topic (the v0 convention)."""
    w = _Writer()
    topics = topics or []
    w.i32(len(topics))
    for t in topics:
        w.string(t)
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_METADATA, 0, 2, w.done())
        brokers = []
        for _ in range(r.i32()):
            brokers.append(
                {"node_id": r.i32(), "host": r.string(),
                 "port": r.i32()}
            )
        out_topics = []
        for _ in range(r.i32()):
            terr = r.i16()
            name = r.string()
            parts = []
            for _p in range(r.i32()):
                perr = r.i16()
                pid = r.i32()
                leader = r.i32()
                replicas = [r.i32() for _x in range(r.i32())]
                isr = [r.i32() for _x in range(r.i32())]
                parts.append(
                    {"error": perr, "partition": pid,
                     "leader": leader, "replicas": replicas,
                     "isr": isr}
                )
            out_topics.append(
                {"error": terr, "name": name, "partitions": parts}
            )
        return {"brokers": brokers, "topics": out_topics}


def list_offsets(
    host: str,
    port: int,
    topic: str,
    partitions: list[int],
    timestamp: int = LATEST,
) -> dict[int, int]:
    """ListOffsets v1: {partition: offset} at the sentinel timestamp
    (``EARLIEST`` = log start, ``LATEST`` = high watermark) — how a
    consumer anchors a stream without reading records."""
    w = _Writer()
    w.i32(-1)  # replica_id: consumer
    w.i32(1).string(topic)
    w.i32(len(partitions))
    for p in partitions:
        w.i32(p).i64(timestamp)
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_LIST_OFFSETS, 1, 4, w.done())
        out: dict[int, int] = {}
        for _ in range(r.i32()):
            r.string()  # topic
            for _p in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                r.i64()  # timestamp
                off = r.i64()
                if err:
                    raise ValueError(
                        f"ListOffsets error {err} for {topic}-{pid}"
                    )
                out[pid] = off
        return out


def find_coordinator(host: str, port: int, group: str) -> tuple[str, int]:
    """FindCoordinator v0 → the (host, port) coordinating ``group`` —
    the first hop of every real consumer-group client. A single-node
    peer answers itself."""
    w = _Writer().string(group)
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_FIND_COORDINATOR, 0, 9, w.done())
        err = r.i16()
        if err:
            raise ValueError(f"FindCoordinator error {err} for {group!r}")
        r.i32()  # node_id
        chost = r.string()
        cport = r.i32()
        return str(chost), int(cport)


def offset_commit(
    host: str,
    port: int,
    group: str,
    topic: str,
    offsets: dict[int, int],
    metadata: str | None = None,
) -> None:
    """OffsetCommit v2: durably record ``{partition: next_offset}``
    for ``group`` at the coordinator — EXTERNAL consumer bookkeeping
    (this engine's own streaming reader keeps offsets in the Spark
    checkpoint instead, the stock connector's model; this surface
    exists for parity with non-Spark consumers sharing the topic)."""
    w = _Writer()
    w.string(group)
    w.i32(-1)  # generation_id: no group membership protocol
    w.string("")  # member_id
    w.i64(-1)  # retention_time_ms: broker default
    w.i32(1).string(topic)
    w.i32(len(offsets))
    for pid in sorted(offsets):
        w.i32(pid).i64(int(offsets[pid])).string(metadata)
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_OFFSET_COMMIT, 2, 10, w.done())
        for _ in range(r.i32()):
            r.string()  # topic
            for _p in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                if err:
                    raise ValueError(
                        f"OffsetCommit error {err} for {topic}-{pid}"
                    )


def offset_fetch(
    host: str,
    port: int,
    group: str,
    topic: str,
    partitions: list[int],
) -> dict[int, int]:
    """OffsetFetch v1 → ``{partition: committed_offset}`` for
    ``group`` (-1 = nothing committed, the wire contract — callers
    anchor such partitions via ListOffsets instead)."""
    w = _Writer()
    w.string(group)
    w.i32(1).string(topic)
    w.i32(len(partitions))
    for pid in partitions:
        w.i32(pid)
    out: dict[int, int] = {}
    with socket.create_connection((host, port), timeout=10) as sock:
        r = _roundtrip(sock, _API_OFFSET_FETCH, 1, 11, w.done())
        for _ in range(r.i32()):
            r.string()  # topic
            for _p in range(r.i32()):
                pid = r.i32()
                off = r.i64()
                r.string()  # metadata
                err = r.i16()
                if err:
                    raise ValueError(
                        f"OffsetFetch error {err} for {topic}-{pid}"
                    )
                out[pid] = off
    return out


def consumed_positions(pdf) -> dict[int, int]:
    """Per-partition next-offsets (max(offset)+1) of a MATERIALIZED
    drain — a pandas frame from ``read_kafka_topic(...).toPandas()``.
    Takes the materialization, not the lazy DataFrame: re-aggregating
    a lazy drain would re-fetch and could see rows produced since."""
    out = pdf.groupby("partition")["offset"].max()
    return {int(p): int(o) + 1 for p, o in out.items()}


def commit_read_position(
    host: str,
    port: int,
    group: str,
    topic: str,
    positions: dict[int, int],
) -> None:
    """Commit the positions the caller actually CONSUMED (per-
    partition next-offsets, e.g. ``consumed_positions(pdf)``) for
    ``group`` — the bookkeeping step after a
    ``read_kafka_topic(group_id=…)`` drain is fully processed.
    At-least-once: a crash before this commit re-reads the batch.
    Committing anything NEWER than what was consumed (a fresh
    ListOffsets(LATEST), say) would silently skip records produced
    between the drain and the commit — at-most-once data loss, which
    is why this function refuses to look up offsets itself."""
    if not positions:
        return
    offset_commit(host, port, group, topic, positions)


def produce(
    host: str,
    port: int,
    topic: str,
    partition: int,
    records: list[dict],
    compression: str = "none",
    acks: int = -1,
    timeout_ms: int = 30000,
) -> int:
    """Produce v3 (r12, VERDICT r11 item 5): encode ``records``
    (``kafka_wire.encode_record_batch`` dicts) as ONE RecordBatch v2
    and append it to the peer; returns the broker-ASSIGNED base
    offset (the producer sends base_offset=0 — offset assignment is
    the broker's job, which is exactly what the round-trip oracle
    exercises: the responder rewrites the batch header's baseOffset,
    CRC-safely, since the v2 CRC covers attributes onward)."""
    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        encode_record_batch,
    )

    record_set = encode_record_batch(
        records, base_offset=0, compression=compression
    )
    with socket.create_connection((host, port), timeout=30) as sock:
        return produce_on(
            sock, topic, partition, record_set, acks, timeout_ms
        )


def produce_on(
    sock: socket.socket,
    topic: str,
    partition: int,
    record_set: bytes,
    acks: int = -1,
    timeout_ms: int = 30000,
    corr_id: int = 6,
) -> int:
    """One Produce v3 round trip on an open socket (the socket-reuse
    face ``write_kafka_topic``'s per-partition tasks drive) →
    broker-assigned base offset. ``record_set`` may hold MULTIPLE
    RecordBatch v2 frames — the peer assigns each a continuing base
    offset; the returned base is the FIRST batch's."""
    if acks == 0:
        # acks=0 is fire-and-forget: real brokers send NO response,
        # so this synchronous client would hang on recv forever
        raise ValueError(
            "acks=0 (fire-and-forget) is not supported by this "
            "synchronous client; use acks=1 or -1"
        )
    w = _Writer()
    w.string(None)      # transactional_id (v3+): not transactional
    w.i16(acks)
    w.i32(timeout_ms)
    w.i32(1).string(topic)
    w.i32(1).i32(partition)
    w.nbytes(record_set)
    r = _roundtrip(sock, _API_PRODUCE, 3, corr_id, w.done())
    n_topics = r.i32()
    if n_topics != 1:
        raise ValueError(f"Produce answered {n_topics} topics, sent 1")
    r.string()  # topic
    n_parts = r.i32()
    if n_parts != 1:
        raise ValueError(f"Produce answered {n_parts} partitions")
    r.i32()  # partition id
    err = r.i16()
    base = r.i64()
    r.i64()  # log_append_time
    # throttle_time_ms trails the responses in Produce v1+ (protocol
    # quirk); nothing to read from it
    if err:
        raise ValueError(
            f"Produce error {err} for {topic}-{partition}"
        )
    return base


def fetch(
    sock: socket.socket,
    topic: str,
    partition: int,
    offset: int,
    max_bytes: int = 1 << 20,
    corr_id: int = 3,
) -> tuple[int, bytes]:
    """One Fetch v4 round trip on an open socket → (high_watermark,
    record-set bytes — zero or more whole RecordBatch v2 frames)."""
    w = _Writer()
    w.i32(-1)           # replica_id: consumer
    w.i32(500)          # max_wait_ms
    w.i32(1)            # min_bytes
    w.i32(max_bytes)    # max_bytes (response-level, v3+)
    w.i8(0)             # isolation_level: read_uncommitted
    w.i32(1).string(topic)
    w.i32(1).i32(partition).i64(offset).i32(max_bytes)
    r = _roundtrip(sock, _API_FETCH, 4, corr_id, w.done())
    r.i32()  # throttle_time_ms
    n_topics = r.i32()
    if n_topics != 1:
        raise ValueError(f"Fetch answered {n_topics} topics, sent 1")
    got_topic = r.string()
    n_parts = r.i32()
    if got_topic != topic or n_parts != 1:
        raise ValueError(
            f"Fetch answered {got_topic}/{n_parts} partitions"
        )
    r.i32()  # partition id
    err = r.i16()
    if err:
        raise ValueError(
            f"Fetch error {err} for {topic}-{partition}@{offset}"
        )
    hwm = r.i64()
    r.i64()  # last_stable_offset
    n_aborted = r.i32()
    for _ in range(max(n_aborted, 0)):
        r.i64()
        r.i64()
    records = r.nbytes() or b""
    return hwm, records


def drain_partition(
    host: str,
    port: int,
    topic: str,
    partition: int,
    start_offset: int = 0,
    max_bytes: int = 1 << 20,
    end_offset: int | None = None,
    include_headers: bool = False,
):
    """Drain ``[start_offset, min(end_offset, high_watermark))`` of
    one partition over one socket, YIELDING one KAFKA_WIRE_SCHEMA-
    ordered row list PER FETCH PAGE (r12, VERDICT r11 item 2: a
    generator — the whole partition slice never exists as one Python
    list, so a fat partition streams through executor memory bounded
    by ``max_bytes``). Paginates on the LAST DECODED offset (+1) — a
    ``max_bytes`` cut mid-log is the normal case, not an error; an
    empty record set below the target raises (a silent gap would drop
    rows). An exclusive ``end_offset`` makes the read a BOUNDED
    micro-batch (the streaming reader's replayable unit)."""
    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        segment_to_wire_rows,
    )

    offset = start_offset
    with socket.create_connection((host, port), timeout=30) as sock:
        corr = 100
        while True:
            hwm, records = fetch(
                sock, topic, partition, offset, max_bytes, corr_id=corr
            )
            corr += 1
            target = hwm if end_offset is None else min(hwm, end_offset)
            if offset >= target:
                break
            rows = segment_to_wire_rows(
                records, topic, partition,
                include_headers=include_headers,
            )
            rows = [r for r in rows if offset <= r[4] < target]
            if not rows:
                raise ValueError(
                    f"Fetch returned no records at {offset} < "
                    f"target {target} for {topic}-{partition}"
                )
            offset = max(r[4] for r in rows) + 1
            yield rows


def read_kafka_topic(
    spark,
    host: str,
    port: int,
    topic: str,
    start_offset: int | None = None,
    max_bytes: int = 1 << 20,
    include_headers: bool = False,
    group_id: str | None = None,
):
    """Batch-read a whole topic over the wire protocol into the exact
    ``format("kafka")`` frame (KAFKA_WIRE_SCHEMA). Driver: one
    Metadata round trip (partition discovery) plus one
    ListOffsets(EARLIEST) anchor per partition — both metadata-sized
    (a retention-trimmed log whose start is nonzero anchors correctly
    instead of dying on OFFSET_OUT_OF_RANGE; pass ``start_offset`` to
    pin an explicit start for every partition instead). Executors:
    one task per partition, each draining its partition over its own
    socket, one pandas frame per Fetch page — record bytes never
    touch the driver, a partition slice never exists whole in an
    executor, and 1000 partitions fan out to 1000 concurrent
    consumers exactly like the stock connector.

    ``include_headers=True`` (stock-connector parity): the frame
    grows a trailing ``headers array<struct<key string, value
    binary>>`` column decoded from each record — the schema changes
    ONLY when asked, like the stock option.

    ``group_id`` (r13): anchor each partition at the group's
    COMMITTED offset (OffsetFetch v1), falling back to EARLIEST for
    partitions with nothing committed (-1, the wire contract) — the
    external batch-consumer resume shape. Pair with
    ``commit_read_position(…, consumed_positions(pdf))`` AFTER the
    drained frame is fully consumed; committing first would drop rows
    on a failed action (at-least-once, like every non-transactional
    consumer)."""
    from dst_spark_k8_lakehouse_spark.shipping import ensure_shipped
    from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
        KAFKA_WIRE_SCHEMA,
        KAFKA_WIRE_SCHEMA_HEADERS,
    )

    ensure_shipped(spark)
    meta = request_metadata(host, port, [topic])
    tmeta = next(
        (t for t in meta["topics"] if t["name"] == topic), None
    )
    if tmeta is None or tmeta["error"]:
        raise ValueError(f"topic {topic!r} unknown to {host}:{port}")
    partitions = [p["partition"] for p in tmeta["partitions"]]
    if group_id is not None:
        if start_offset is not None:
            raise ValueError(
                "pass start_offset OR group_id, not both"
            )
        committed = offset_fetch(host, port, group_id, topic, partitions)
        fresh = [p for p in partitions if committed[p] < 0]
        anchors = (
            list_offsets(host, port, topic, fresh, EARLIEST)
            if fresh else {}
        )
        starts = {
            p: committed[p] if committed[p] >= 0 else anchors[p]
            for p in partitions
        }
    elif start_offset is None:
        starts = list_offsets(host, port, topic, partitions, EARLIEST)
    else:
        starts = {p: start_offset for p in partitions}

    # repartitionByRange gives the documented 1:1 partition→task
    # mapping (hash repartition can collide two Kafka partitions into
    # one task and leave another idle)
    from dst_spark_k8_lakehouse_spark.localrel import local_frame

    # local_frame: the plan rows come from the driver; an RDD-scan
    # frame would add a Python-worker parallelize job per read (r13)
    plan = local_frame(
        spark,
        [(topic, p, host, port, starts[p], max_bytes)
         for p in partitions],
        "topic string, partition int, host string, port int, "
        "start_offset long, max_bytes int",
    ).repartitionByRange(len(partitions), "partition")

    cols = ["key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType"]
    if include_headers:
        cols.append("headers")

    def _drain(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                for page in drain_partition(
                    row.host, int(row.port), row.topic,
                    int(row.partition), int(row.start_offset),
                    int(row.max_bytes),
                    include_headers=include_headers,
                ):
                    out = pd.DataFrame(page, columns=cols)
                    out["timestamp"] = pd.to_datetime(
                        out["timestamp"], unit="ms"
                    )
                    yield out

    return plan.mapInPandas(
        _drain,
        schema=(
            KAFKA_WIRE_SCHEMA_HEADERS if include_headers
            else KAFKA_WIRE_SCHEMA
        ),
    )


# ------------------------------------------------------------ responder


class SegmentResponder:
    """In-process loopback peer serving on-disk segment dirs over the
    wire protocol (ApiVersions v0 / Metadata v0 / ListOffsets v1 /
    Fetch v4 / Produce v3 / FindCoordinator v0 / OffsetCommit v2 /
    OffsetFetch v1). One thread, sequential connections with a
    per-connection recv timeout — a correctness fixture, not a
    broker. Topic layout = ``kafka_wire`` convention:
    ``<root>/<topic>-<partition>/*.log``; Produce validates each
    record set (bounds/magic/CRC-32C, answering CORRUPT_MESSAGE on
    failure) then appends with broker offset assignment,
    auto-creating unknown topic-partitions; consumer-group offsets
    live in ``group_offsets`` for the responder's lifetime."""

    def __init__(self, root: str, host: str = "127.0.0.1") -> None:
        import os

        self.root = root
        self.partitions: dict[tuple[str, int], str] = {}
        for d in sorted(os.listdir(root)):
            full = os.path.join(root, d)
            if not os.path.isdir(full):
                continue
            topic, _, part = d.rpartition("-")
            if not (topic and part.isdigit()):
                continue
            segs = sorted(
                os.path.join(full, f) for f in os.listdir(full)
                if f.endswith(".log")
            )
            if segs:
                # fixture segments are single-file logs; concatenated
                # batches read identically either way
                self.partitions[(topic, int(part))] = segs[0]
        self._srv = socket.create_server((host, 0))
        self.host, self.port = self._srv.getsockname()
        # consumer-group committed offsets, the coordinator surface:
        # {(group, topic, partition): (offset, metadata)} — a real
        # broker persists these in __consumer_offsets; the fixture
        # keeps them for the responder's lifetime (same durability
        # class as its in-memory partition map)
        self.group_offsets: dict[
            tuple[str, str, int], tuple[int, str | None]
        ] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._serve, name="kafka-segment-responder",
            daemon=True,
        )

    # -- lifecycle

    def __enter__(self) -> "SegmentResponder":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _create_partition(self, topic: str, pid: int) -> str:
        import os

        d = os.path.join(self.root, f"{topic}-{pid}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "00000000000000000000.log")
        if not os.path.exists(path):
            open(path, "wb").close()
        self.partitions[(topic, pid)] = path
        return path

    def close(self) -> None:
        self._stop.set()
        try:
            # unblock accept()
            socket.create_connection(
                (self.host, self.port), timeout=1
            ).close()
        except OSError:
            pass
        self._srv.close()
        self._thread.join(timeout=5)

    # -- serving

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _addr = self._srv.accept()
            except OSError:
                return
            with conn:
                if self._stop.is_set():
                    return
                # the accept loop is single-threaded: without a recv
                # timeout one stalled client socket blocks EVERY other
                # partition's consumer (surfacing only as an opaque
                # awaitTermination timeout) — a dead client must drop
                # its connection, not wedge the responder
                conn.settimeout(30)
                try:
                    while True:
                        # TCP is a byte stream: the 4-byte size prefix
                        # may arrive split. Only a 0-byte FIRST read is
                        # a clean close; a partial prefix must be
                        # completed, not treated as EOF.
                        first = conn.recv(4)
                        if not first:
                            break
                        raw = first + (
                            _recv_exact(conn, 4 - len(first))
                            if len(first) < 4 else b""
                        )
                        size = struct.unpack(">i", raw)[0]
                        req = _Reader(_recv_exact(conn, size))
                        try:
                            resp = self._respond(req)
                        except Exception:
                            # a MALFORMED request (truncated body,
                            # bad framing) must drop this connection,
                            # never kill the serve thread — the
                            # responder keeps serving everyone else
                            break
                        conn.sendall(
                            struct.pack(">i", len(resp)) + resp
                        )
                except (ConnectionError, OSError):
                    pass  # client went away: next connection

    def _respond(self, req: _Reader) -> bytes:
        api_key = req.i16()
        api_version = req.i16()
        corr_id = req.i32()
        req.string()  # client_id
        w = _Writer().i32(corr_id)
        if api_key == _API_VERSIONS and api_version == 0:
            w.i16(_ERR_NONE)
            w.i32(8)
            w.i16(_API_OFFSET_COMMIT).i16(2).i16(2)
            w.i16(_API_OFFSET_FETCH).i16(1).i16(1)
            w.i16(_API_FIND_COORDINATOR).i16(0).i16(0)
            w.i16(_API_PRODUCE).i16(3).i16(3)
            w.i16(_API_FETCH).i16(4).i16(4)
            w.i16(_API_LIST_OFFSETS).i16(1).i16(1)
            w.i16(_API_METADATA).i16(0).i16(0)
            w.i16(_API_VERSIONS).i16(0).i16(0)
            return w.done()
        if api_key == _API_PRODUCE and api_version == 3:
            req.string()  # transactional_id: ignored (no txns served)
            req.i16()     # acks: the append below is synchronous
            req.i32()     # timeout_ms
            n_topics = req.i32()
            resp: list[tuple[str, list[tuple[int, int]]]] = []
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                parts = []
                for _p in range(n_parts):
                    pid = req.i32()
                    record_set = req.nbytes() or b""
                    # real brokers validate ON PRODUCE: a corrupt-but-
                    # parseable record set answered _ERR_NONE would be
                    # written into the segment and poison every later
                    # Fetch of this partition
                    try:
                        _validate_record_set(record_set)
                    except ValueError:
                        parts.append((pid, _ERR_CORRUPT_MESSAGE, -1))
                        continue
                    seg = self.partitions.get((topic, pid))
                    if seg is None:
                        # brokers auto-create topics by default; the
                        # write face needs fresh topics to exist
                        seg = self._create_partition(topic, pid)
                    base = _append_record_set(seg, record_set)
                    parts.append((pid, _ERR_NONE, base))
                resp.append((topic, parts))
            w.i32(len(resp))
            for topic, parts in resp:
                w.string(topic).i32(len(parts))
                for pid, err, base in parts:
                    w.i32(pid).i16(err).i64(base).i64(-1)
            w.i32(0)  # throttle_time_ms TRAILS responses in Produce
            return w.done()
        if api_key == _API_LIST_OFFSETS and api_version == 1:
            req.i32()  # replica_id
            n_topics = req.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                w.string(topic).i32(n_parts)
                for _p in range(n_parts):
                    pid = req.i32()
                    ts = req.i64()
                    seg = self.partitions.get((topic, pid))
                    if seg is None:
                        w.i32(pid).i16(_ERR_UNKNOWN_TOPIC)
                        w.i64(-1).i64(-1)
                        continue
                    if ts == LATEST:
                        off, _ = _slice_segment(seg, 1 << 62, 0)
                    elif ts == EARLIEST:
                        off = _log_start(seg)
                    else:
                        # timestamp lookup (the protocol contract):
                        # offset of the FIRST record with
                        # timestamp >= ts; -1 when nothing qualifies
                        off = _offset_for_timestamp(seg, ts)
                    w.i32(pid).i16(_ERR_NONE).i64(-1).i64(off)
            return w.done()
        if api_key == _API_METADATA and api_version == 0:
            n = req.i32()
            asked = {req.string() for _ in range(n)} if n > 0 else None
            w.i32(1).i32(0).string(self.host).i32(self.port)
            topics = sorted({t for t, _p in self.partitions})
            if asked is not None:
                topics = [t for t in topics if t in asked]
                missing = sorted(asked - set(topics))
            else:
                missing = []
            w.i32(len(topics) + len(missing))
            for t in topics:
                parts = sorted(
                    p for tt, p in self.partitions if tt == t
                )
                w.i16(_ERR_NONE).string(t).i32(len(parts))
                for p in parts:
                    w.i16(_ERR_NONE).i32(p).i32(0)
                    w.i32(1).i32(0)  # replicas
                    w.i32(1).i32(0)  # isr
            for t in missing:
                w.i16(_ERR_UNKNOWN_TOPIC).string(t).i32(0)
            return w.done()
        if api_key == _API_FETCH and api_version == 4:
            req.i32()  # replica_id
            req.i32()  # max_wait
            req.i32()  # min_bytes
            req.i32()  # max_bytes (response-level; per-partition used)
            req.i8()   # isolation
            n_topics = req.i32()
            w.i32(0)   # throttle
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                w.string(topic).i32(n_parts)
                for _p in range(n_parts):
                    pid = req.i32()
                    offset = req.i64()
                    pmax = req.i32()
                    w.i32(pid)
                    seg = self.partitions.get((topic, pid))
                    if seg is None:
                        w.i16(_ERR_UNKNOWN_TOPIC).i64(-1).i64(-1)
                        w.i32(0).nbytes(None)
                        continue
                    # real-broker semantics: an ask below the log
                    # start (retention-trimmed log) is
                    # OFFSET_OUT_OF_RANGE, not a silent covering read
                    # — consumers must anchor via ListOffsets
                    if offset < _log_start(seg):
                        w.i16(_ERR_OFFSET_OUT_OF_RANGE)
                        w.i64(-1).i64(-1).i32(0).nbytes(None)
                        continue
                    hwm, records = _slice_segment(seg, offset, pmax)
                    w.i16(_ERR_NONE).i64(hwm).i64(hwm)
                    w.i32(0)  # no aborted txns
                    w.nbytes(records)
            return w.done()
        if api_key == _API_FIND_COORDINATOR and api_version == 0:
            # a single-node peer coordinates every group itself
            req.string()  # coordinator_key (the group id)
            w.i16(_ERR_NONE).i32(0).string(self.host).i32(self.port)
            return w.done()
        if api_key == _API_OFFSET_COMMIT and api_version == 2:
            group = req.string() or ""
            req.i32()     # generation_id: no rebalance protocol served
            req.string()  # member_id
            req.i64()     # retention_time_ms: fixture never expires
            n_topics = req.i32()
            resp_oc: list[tuple[str, list[tuple[int, int]]]] = []
            for _ in range(n_topics):
                topic = req.string()
                parts = []
                for _p in range(req.i32()):
                    pid = req.i32()
                    off = req.i64()
                    md = req.string()
                    self.group_offsets[(group, topic, pid)] = (off, md)
                    parts.append((pid, _ERR_NONE))
                resp_oc.append((topic, parts))
            w.i32(len(resp_oc))
            for topic, parts in resp_oc:
                w.string(topic).i32(len(parts))
                for pid, err in parts:
                    w.i32(pid).i16(err)
            return w.done()
        if api_key == _API_OFFSET_FETCH and api_version == 1:
            group = req.string() or ""
            n_topics = req.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = req.string()
                pids = [req.i32() for _p in range(req.i32())]
                w.string(topic).i32(len(pids))
                for pid in pids:
                    off, md = self.group_offsets.get(
                        (group, topic, pid), (-1, None)
                    )  # -1 = nothing committed, the wire contract
                    w.i32(pid).i64(off).string(md).i16(_ERR_NONE)
            return w.done()
        # every other (key, version): loud UNSUPPORTED_VERSION with a
        # shape-correct minimal body so clients fail cleanly
        return w.i16(_ERR_UNSUPPORTED_VERSION).i32(0).done()


def _validate_record_set(buf: bytes) -> None:
    """Produce-side validation (ADVICE r12): every RecordBatch v2
    frame in the set must be in-bounds, magic=2, and CRC-32C-clean
    (the v2 CRC covers attributes onward — exactly what
    ``_append_record_set``'s baseOffset rewrite preserves). Raises
    ``ValueError``; the responder answers ``_ERR_CORRUPT_MESSAGE``
    instead of appending."""
    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import crc32c

    pos, n = 0, len(buf)
    if n == 0:
        raise ValueError("empty record set")
    while pos < n:
        if n - pos < 21:  # header: baseOffset(8) len(4) epoch(4) magic(1) crc(4)
            raise ValueError("truncated RecordBatch header")
        _base, batch_len = struct.unpack_from(">qi", buf, pos)
        end = pos + 12 + batch_len
        if batch_len < 9 or end > n:
            raise ValueError(
                f"RecordBatch length {batch_len} out of bounds "
                f"(set size {n}, at {pos})"
            )
        if buf[pos + 16] != 2:
            raise ValueError(f"RecordBatch magic {buf[pos + 16]} != 2")
        crc = struct.unpack_from(">I", buf, pos + 17)[0]
        if crc32c(buf[pos + 21:end]) != crc:
            raise ValueError("RecordBatch CRC-32C mismatch")
        pos = end


def _append_record_set(path: str, record_set: bytes) -> int:
    """Append WHOLE RecordBatch v2 frames to a segment file, rewriting
    each batch's ``baseOffset`` so the log's offsets continue — broker
    offset assignment. CRC-safe: the v2 CRC covers attributes onward,
    never the baseOffset header field. Returns the first assigned
    offset."""
    import os

    hwm = 0
    if os.path.exists(path) and os.path.getsize(path):
        hwm, _ = _slice_segment(path, 1 << 62, 0)  # hwm probe only
    out = bytearray(record_set)
    first = hwm
    pos = 0
    while pos < len(out):
        _base, batch_len = struct.unpack_from(">qi", out, pos)
        struct.pack_into(">q", out, pos, hwm)
        # records in the batch = lastOffsetDelta + 1 (int32 right
        # after the attributes int16 — same layout _slice_segment uses)
        last_delta = struct.unpack_from(">i", out, pos + 23)[0]
        hwm += last_delta + 1
        pos += 12 + batch_len
    with open(path, "ab") as fh:
        fh.write(out)
    return first


def write_kafka_topic(
    df,
    host: str,
    port: int,
    topic: str,
    records_per_batch: int = 500,
    compression: str = "none",
):
    """The distributed WRITE face (r12): produce a frame with columns
    ``(key binary|string, value binary|string, partition int,
    timestamp_ms long?)`` to a Kafka-protocol peer over Produce v3 —
    every task produces ITS OWN rows over one socket, grouped locally
    by destination partition, one Produce request per
    ``records_per_batch`` chunk, offsets assigned by the broker.
    Returns a DataFrame of per-request acks
    ``(partition, base_offset, n_records)`` — an ACTIONABLE receipt
    (count it to trigger the write; at-least-once like the stock
    sink's non-transactional mode).

    WHY at 100 TB: NO shuffle and NO pre-count — unlike the READ
    face (whose per-partition offset bounds genuinely need one
    consumer per partition), producing is order-free across tasks,
    so the stock sink's shape is right: each task writes in place,
    record bytes never touch the driver, and throughput scales with
    the upstream partitioning. Per-partition record ORDER across
    tasks is unspecified (same as the stock non-transactional sink);
    offsets within each request are still contiguous.

    FIXTURE-PEER CAVEAT: this engine's own ``SegmentResponder`` test
    peer serves ONE connection at a time, while each task here holds
    its socket for the task's whole lifetime — against the fixture,
    concurrent producing tasks serialize behind each other, and a
    task idle >30 s between requests is dropped by the responder's
    recv timeout (surfacing as a ConnectionError in that task). A
    real broker multiplexes connections and this shape is correct
    there; against the fixture, keep producer parallelism modest or
    produce promptly once connected."""
    from dst_spark_k8_lakehouse_spark.shipping import ensure_shipped

    spark = df.sparkSession
    ensure_shipped(spark)
    if not {"value", "partition"} <= set(df.columns):
        raise ValueError(
            "write_kafka_topic needs value and partition columns"
        )

    def _produce(batches):
        import pandas as pd

        from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
            encode_record_batch,
        )

        def _nbytes(v):
            # nulls pass through as TOMBSTONES (encode_record_batch
            # natively supports value=None) — never str(None).encode()
            # == b"None"; pandas spells a null cell as NaN, which
            # `is not None` misses
            if v is None or (not isinstance(v, bytes) and pd.isna(v)):
                return None
            return v if isinstance(v, bytes) else str(v).encode()

        def _hdrs(cell):
            # array<struct<key,value>> arrives as a sequence of
            # dict-like cells; absent column → no headers
            if cell is None:
                return []
            return [
                (h["key"], h["value"]) if isinstance(h, dict)
                else (h[0], h[1])
                for h in cell
            ]

        def _flush(sock, part, chunk):
            recs = [
                {
                    "key": _nbytes(k),
                    "value": _nbytes(v),
                    "timestamp_ms": (
                        0 if ts is None or pd.isna(ts) else int(ts)
                    ),
                    "headers": _hdrs(hs),
                }
                for k, v, ts, hs in chunk
            ]
            base = produce_on(
                sock, topic, int(part),
                encode_record_batch(recs, compression=compression),
            )
            return (int(part), int(base), len(recs))

        sock = None
        try:
            acks = []
            for pdf in batches:
                for part, grp in pdf.groupby("partition", sort=True):
                    rows = list(
                        zip(
                            grp["key"]
                            if "key" in grp else [None] * len(grp),
                            grp["value"],
                            grp["timestamp_ms"]
                            if "timestamp_ms" in grp else [0] * len(grp),
                            grp["headers"]
                            if "headers" in grp else [None] * len(grp),
                        )
                    )
                    if sock is None:  # one socket per task, lazily
                        sock = socket.create_connection(
                            (host, port), timeout=30
                        )
                    for i in range(0, len(rows), records_per_batch):
                        acks.append(_flush(
                            sock, part, rows[i:i + records_per_batch]
                        ))
            yield pd.DataFrame(
                acks, columns=["partition", "base_offset", "n_records"]
            )
        finally:
            if sock is not None:
                sock.close()

    return df.mapInPandas(
        _produce,
        schema="partition int, base_offset long, n_records int",
    )


def _log_start(path: str) -> int:
    """First base offset of a segment file (ListOffsets EARLIEST)."""
    with open(path, "rb") as fh:
        head = fh.read(8)
    if len(head) < 8:
        return 0
    return struct.unpack(">q", head)[0]


def _offset_for_timestamp(path: str, ts_ms: int) -> int:
    """ListOffsets timestamp lookup: the offset of the first record
    whose timestamp is ≥ ``ts_ms``, or -1 when no such record exists
    (the wire contract; consumers treat -1 as "start at the end").
    Batch maxTimestamp headers (an 8-byte seek-read per batch, spans
    from the shared cache — never a whole-file read) narrow the scan;
    only candidate batches decode record-level."""
    import os

    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        decode_record_batches,
    )

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        spans = _SPAN_CACHE.get((path, size))
        if spans is None:
            spans = _segment_spans(fh.read(), path)
        for base, start, end in spans:
            # maxTimestamp int64 sits after attributes(2) +
            # lastOffsetDelta(4) + baseTimestamp(8) in the batch body
            fh.seek(start + 21 + 14)
            max_ts = struct.unpack(">q", fh.read(8))[0]
            if max_ts < ts_ms:
                continue
            fh.seek(start)
            for batch in decode_record_batches(fh.read(end - start)):
                hits = [
                    r["offset"] for r in batch["records"]
                    if r["timestamp_ms"] >= ts_ms
                ]
                if hits:
                    return min(hits)
    return -1


# parsed (base, start, end) spans per (path, file size): a segment
# file only ever APPENDS whole batches, so a size change invalidates
# exactly one entry and re-parsing starts from scratch — this keeps a
# paginated drain O(page) per Fetch instead of re-span-scanning the
# whole file every page
_SPAN_CACHE: dict[tuple[str, int], list[tuple[int, int, int]]] = {}


def _segment_spans(
    buf: bytes, path: str
) -> list[tuple[int, int, int]]:
    key = (path, len(buf))
    spans = _SPAN_CACHE.get(key)
    if spans is None:
        spans = []
        pos = 0
        while pos < len(buf):
            base, batch_len = struct.unpack_from(">qi", buf, pos)
            end = pos + 12 + batch_len
            spans.append((base, pos, end))
            pos = end
        _SPAN_CACHE[key] = spans
        # drop stale sizes of the same path (append-only growth)
        for k in [k for k in _SPAN_CACHE if k[0] == path and k != key]:
            del _SPAN_CACHE[k]
    return spans


def _slice_segment(
    path: str, offset: int, max_bytes: int
) -> tuple[int, bytes]:
    """(high_watermark, WHOLE batches covering ``offset``, capped at
    ``max_bytes`` but never zero batches while data remains) — the
    broker contract: batches are the atom, a fetch below the high
    watermark always makes progress. On a span-cache hit only the
    sliced byte ranges are read (seek), so a paginated drain costs
    O(page) per Fetch, not O(file)."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        spans = _SPAN_CACHE.get((path, size))
        if spans is None:
            spans = _segment_spans(fh.read(), path)
            fh.seek(0)
        if not spans:
            return 0, b""
        # high watermark = last offset of the last batch + 1; the
        # lastOffsetDelta int32 sits right after the fixed header
        # (attributes int16 first)
        last_base, last_start, _ = spans[-1]
        fh.seek(last_start + 23)
        last_delta = struct.unpack(">i", fh.read(4))[0]
        hwm = last_base + last_delta + 1
        out = bytearray()
        for i, (base, start, end) in enumerate(spans):
            nxt = spans[i + 1][0] if i + 1 < len(spans) else hwm
            if nxt <= offset:  # batch wholly below the asked offset
                continue
            if out and len(out) + (end - start) > max_bytes:
                break
            fh.seek(start)
            out += fh.read(end - start)
        return hwm, bytes(out)


# --------------------------------------------------------------------------
# registry query: the SOCKET loopback (S13's connection half)

_RESPONDERS: dict[str, "SegmentResponder"] = {}


def _responder_fixture(spark, sf_dir: str) -> "SegmentResponder":
    """One live loopback responder per (process, sf_dir), serving the
    r10 segment fixture; kept open until process exit because the
    returned DataFrames drain it lazily at collect time."""
    got = _RESPONDERS.get(sf_dir)
    if got is not None:
        return got
    import atexit

    from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
        _segment_fixture,
    )

    responder = SegmentResponder(_segment_fixture(spark, sf_dir))
    responder.__enter__()
    atexit.register(responder.close)
    _RESPONDERS[sf_dir] = responder
    return responder


# (responder, acks-consistent flag) per (process, sf_dir) — the
# produce oracle writes ONCE and every later call (repeat-call probe)
# drains the same log
_PRODUCE_STATE: dict[str, tuple["SegmentResponder", bool]] = {}


def _staged_responder(prefix: str) -> "SegmentResponder":
    """A live responder over a fresh EMPTY root, torn down at process
    exit — the shared staging step of the produce-side fixtures."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    responder = SegmentResponder(root)
    responder.__enter__()
    atexit.register(responder.close)
    return responder


def _events_wire_payload(spark, sf_dir: str, with_headers: bool):
    """The 2000-event fixtures' wire payload, shared by BOTH
    produce-side fixtures so the load-bearing details live once:
    JSON values with the FULL-microsecond timestampFormat (to_json's
    default truncates to millis and would fail parse_kafka_events'
    round trip), partition = event_id % 2. Keeps ``eid`` for wave
    filtering; callers drop it before producing."""
    from pyspark.sql import functions as F

    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") <= 2000
    )
    cols = [
        F.col("event_id").alias("eid"),
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(*ev.columns),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).cast("binary").alias("value"),
        (F.col("event_id") % 2).cast("int").alias("partition"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias(
            "timestamp_ms"
        ),
    ]
    if with_headers:
        # per-record HEADERS (r13, includeHeaders parity): one
        # value-checkable header keyed to the record plus one
        # null-valued header (hvlen=-1 on the wire) — the read side
        # folds both into its oracle hash
        cols.append(
            F.array(
                F.struct(
                    F.lit("eid").alias("key"),
                    F.col("event_id").cast("string").cast("binary")
                    .alias("value"),
                ),
                F.struct(
                    F.lit("null_h").alias("key"),
                    F.lit(None).cast("binary").alias("value"),
                ),
            ).alias("headers")
        )
    return ev.select(*cols)


def _produce_fixture(spark, sf_dir: str) -> tuple["SegmentResponder", bool]:
    """A responder with an EMPTY root; the first call PRODUCES the
    2000-event set over TCP through the distributed write face
    (gzip batches, broker-assigned offsets, topic auto-created),
    records whether the acks and ListOffsets(LATEST) agree with the
    produced row counts, and memoizes — repeat calls drain identical
    state."""
    got = _PRODUCE_STATE.get(sf_dir)
    if got is not None:
        return got
    from pyspark.sql import functions as F

    responder = _staged_responder("dst-kafka-produce-")
    payload = _events_wire_payload(
        spark, sf_dir, with_headers=True
    ).drop("eid")
    acks = write_kafka_topic(
        payload, responder.host, responder.port, "produced",
        records_per_batch=100, compression="gzip",
    ).collect()
    per_part = {
        int(r["partition"]): int(r["n"])
        for r in payload.groupBy("partition").agg(
            F.count("*").alias("n")
        ).collect()
    }
    hwm = list_offsets(
        responder.host, responder.port, "produced",
        sorted(per_part), LATEST,
    )
    ok = (
        sum(a.n_records for a in acks) == sum(per_part.values())
        and hwm == per_part  # broker-assigned offsets are gapless
    )
    _PRODUCE_STATE[sf_dir] = (responder, ok)
    return _PRODUCE_STATE[sf_dir]


# (responder, resume-contract flag) per (process, sf_dir) — wave A is
# produced, group-read (EARLIEST fallback), committed; wave B produced
# after. The query then group-reads repeatedly: always exactly wave B.
_GROUP_RESUME_STATE: dict[str, tuple["SegmentResponder", bool]] = {}

_RESUME_GROUP = "resume-oracle"
_RESUME_SPLIT = 1000  # wave A = event_id <= split; wave B = the rest


def _group_resume_fixture(
    spark, sf_dir: str
) -> tuple["SegmentResponder", bool]:
    """The external batch-consumer RESUME shape, staged once per
    (process, sf_dir): produce wave A → group-anchored read (nothing
    committed yet → EARLIEST fallback) → ``commit_read_position`` →
    produce wave B. The memoized flag folds the wave-A leg into the
    oracle: the anchored read saw exactly wave A's rows and the
    committed position equals wave A's per-partition high watermark."""
    got = _GROUP_RESUME_STATE.get(sf_dir)
    if got is not None:
        return got
    from pyspark.sql import functions as F

    responder = _staged_responder("dst-kafka-resume-")
    payload = _events_wire_payload(spark, sf_dir, with_headers=False)
    wave_a = payload.filter(F.col("eid") <= _RESUME_SPLIT).drop("eid")
    wave_b = payload.filter(F.col("eid") > _RESUME_SPLIT).drop("eid")
    n_a = wave_a.count()
    write_kafka_topic(
        wave_a, responder.host, responder.port, "resumed",
        records_per_batch=100,
    ).collect()
    first = read_kafka_topic(
        spark, responder.host, responder.port, "resumed",
        group_id=_RESUME_GROUP,
    ).toPandas()
    positions = consumed_positions(first)
    commit_read_position(
        responder.host, responder.port, _RESUME_GROUP, "resumed",
        positions,
    )
    hwm = list_offsets(
        responder.host, responder.port, "resumed",
        sorted(positions), LATEST,
    )
    ok = len(first) == n_a and positions == hwm
    write_kafka_topic(
        wave_b, responder.host, responder.port, "resumed",
        records_per_batch=100,
    ).collect()
    _GROUP_RESUME_STATE[sf_dir] = (responder, ok)
    return _GROUP_RESUME_STATE[sf_dir]


def _register() -> None:
    from dst_spark_k8_lakehouse_spark.exact import sum_sql
    from dst_spark_k8_lakehouse_spark.registry import query

    @query(
        "s13_kafka_tcp",
        oracle=f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id,
                   {sum_sql('value')} AS total_value
            FROM events
            WHERE event_id <= 2000
            GROUP BY event_type
        """,
    )
    def s13_kafka_tcp(spark, sf_dir: str):
        """S13 SOCKET LOOPBACK (r11, VERDICT r10 item 6): the same
        2000-event segment fixture as ``s13_kafka_wire``, but reached
        the way a real consumer reaches a broker — ApiVersions +
        Metadata over TCP on the driver, then one executor task per
        partition draining Fetch v4 pages over its own socket
        (max_bytes forces mid-log pagination), decoded by the r10
        codec, parsed, aggregated, value-checked against the
        relational oracle. Closes everything testable about S13
        without a broker binary: framing, correlation ids,
        partition fan-out, high-watermark pagination, CRC."""
        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            parse_kafka_events,
        )
        from pyspark.sql import functions as F

        responder = _responder_fixture(spark, sf_dir)
        # 64 KiB pages ≈ several Fetch round trips per partition —
        # the pagination path is exercised on every run, not just in
        # the unit tests
        wire = read_kafka_topic(
            spark, responder.host, responder.port, "events",
            max_bytes=64 << 10,
        )
        events = parse_kafka_events(wire)
        return events.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
        )

    @query(
        "s13_kafka_produce",
        oracle=f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id,
                   {sum_sql('value')} AS total_value,
                   TRUE AS produced_ok,
                   CAST(count(*) AS BIGINT) AS n_hdr_match
            FROM events
            WHERE event_id <= 2000
            GROUP BY event_type
        """,
    )
    def s13_kafka_produce(spark, sf_dir: str):
        """S13 PRODUCE ROUND TRIP (r12, VERDICT r11 item 5): the
        2000-event set is WRITTEN over the wire protocol — the
        distributed ``write_kafka_topic`` face (one producing socket
        per partition task, gzip batches, Produce v3) into an
        auto-created topic with broker-ASSIGNED offsets — then read
        back through Fetch v4 (CRC verified on every batch, so the
        append's baseOffset rewrite is byte-conformance-pinned
        against the kafka_wire codec), parsed and value-checked
        against the relational oracle. ``produced_ok`` folds the
        write-side receipts into the hash: ack row counts match the
        produced set and ListOffsets(LATEST) equals each partition's
        row count (gapless assignment). ``n_hdr_match`` (r13,
        ``includeHeaders`` parity) folds the HEADER round trip in
        too: every record carries an ``eid`` header equal to its key
        plus a null-valued header, and the read side — with
        ``include_headers=True``, the stock connector's option —
        must count every row's headers exact (the oracle pins the
        count at count(*), so one dropped or corrupted header flips
        the hash). With the consumer trio (wire/tcp/stream) this
        completes the engine's Kafka story: read AND write, headers
        included, jar-free, against a real socket."""
        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            EVENTS_STREAM_SCHEMA,
        )
        from pyspark.sql import functions as F

        responder, ok = _produce_fixture(spark, sf_dir)
        wire = read_kafka_topic(
            spark, responder.host, responder.port, "produced",
            max_bytes=64 << 10, include_headers=True,
        )
        hdr_ok = (
            (F.size("headers") == 2)
            & (F.col("headers")[0]["key"] == "eid")
            & (
                F.col("headers")[0]["value"].cast("string")
                == F.col("key").cast("string")
            )
            & (F.col("headers")[1]["key"] == "null_h")
            & F.col("headers")[1]["value"].isNull()
        )
        events = wire.select(
            F.from_json(
                F.col("value").cast("string"), EVENTS_STREAM_SCHEMA
            ).alias("e"),
            hdr_ok.cast("long").alias("hdr_ok"),
        ).select("e.*", "hdr_ok")
        return events.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
            F.first(F.lit(bool(ok))).alias("produced_ok"),
            F.sum("hdr_ok").alias("n_hdr_match"),
        )

    @query(
        "s13_kafka_group_resume",
        oracle=f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id,
                   {sum_sql('value')} AS total_value,
                   TRUE AS resume_ok
            FROM events
            WHERE event_id > {_RESUME_SPLIT} AND event_id <= 2000
            GROUP BY event_type
        """,
    )
    def s13_kafka_group_resume(spark, sf_dir: str):
        """S13 CONSUMER-GROUP RESUME (r13, VERDICT r12 item 4
        stretch, oracle-checked end to end): the external
        batch-consumer bookkeeping loop over the coordinator surface.
        The fixture produces wave A (event_id <= _RESUME_SPLIT), reads it
        group-anchored (OffsetFetch answers -1 → EARLIEST fallback),
        ``commit_read_position``s, then produces wave B. THIS query
        is the resumed read: ``read_kafka_topic(group_id=…)`` anchors
        every partition at the group's committed offset, so it must
        return EXACTLY wave B — one lost/duplicated row or a
        mis-anchored partition flips the oracle hash, and the
        memoized ``resume_ok`` folds the wave-A leg (anchored first
        read saw exactly wave A; committed == its high watermark) in
        too. Repeat calls re-read from the same committed position —
        identical results, the driver's repeat-call probe holds."""
        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            parse_kafka_events,
        )
        from pyspark.sql import functions as F

        responder, ok = _group_resume_fixture(spark, sf_dir)
        wire = read_kafka_topic(
            spark, responder.host, responder.port, "resumed",
            max_bytes=64 << 10, group_id=_RESUME_GROUP,
        )
        events = parse_kafka_events(wire)
        return events.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
            F.first(F.lit(bool(ok))).alias("resume_ok"),
        )


_register()
