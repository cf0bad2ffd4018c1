"""``format("kafka_tcp")`` — a Spark 4 Python DataSource reading a
Kafka-protocol peer over TCP through the jar-free client
(``sources/kafka_broker.py``), batch AND structured streaming.

This is the stock ``format("kafka")`` source's consumer topology
re-expressed on the engine's own wire stack:

- **Batch**: Metadata discovers partitions on the driver; one
  ``InputPartition`` per topic-partition; each executor task opens its
  own socket and drains ``[EARLIEST, LATEST)`` (offsets anchored by
  ListOffsets, so concurrent appends don't tear a batch).
- **Streaming**: a ``DataSourceStreamReader`` whose offsets are
  ``{partition: next_offset}`` dicts — ``latestOffset`` asks
  ListOffsets(LATEST), ``partitions(start, end)`` plans one bounded
  ``[lo, hi)`` micro-batch unit per advanced partition, and ``read``
  drains exactly that range (``drain_partition(end_offset=…)``), so a
  replayed epoch re-reads IDENTICAL rows — the property exactly-once
  sinks (``stream_to_delta`` / ``stream_to_iceberg`` epoch
  watermarks) compose with.
- **Writes (r12)**: ``df.write.format("kafka_tcp").mode("append")``
  and ``writeStream.format("kafka_tcp")`` — each task produces its
  rows over one socket in bounded chunks (Produce v3, broker-assigned
  offsets). At-least-once like the stock non-transactional kafka
  sink; the ``t11_kafka_tcp_pipe`` capstone runs the full
  kafka→kafka hop.

Options: ``host``, ``port``, ``topic`` (required), ``maxbytes``
(Fetch page size, default 1 MiB), ``startingoffsets``
(``earliest``/``latest``, batch start + stream anchor, default
earliest), ``startingtimestamp`` (epoch ms — the stock connector's
startingOffsetsByTimestamp shape, resolved via ListOffsets; a
partition with no qualifying record anchors at the end). Rows are the
exact ``KAFKA_WIRE_SCHEMA`` frame, so ``parse_kafka_events`` and
every downstream pipeline are shared code.

WHY at 100 TB: record bytes never touch the driver (metadata-only
planning), partitions fan out to one consumer socket per task like
the real connector, and micro-batch units are offset-bounded so
retries are deterministic at any scale.
"""

from __future__ import annotations

from typing import Iterator

from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _TcpPartition(InputPartition):
    def __init__(
        self,
        host: str,
        port: int,
        topic: str,
        partition: int,
        start: int,
        end: int | None,
        max_bytes: int,
        include_headers: bool = False,
    ) -> None:
        self.host = host
        self.port = port
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end
        self.max_bytes = max_bytes
        self.include_headers = include_headers


def _read_tcp_partition(p: _TcpPartition) -> Iterator[tuple]:
    import datetime

    from dst_spark_k8_lakehouse_spark.sources.kafka_broker import (
        drain_partition,
    )

    epoch = datetime.datetime(1970, 1, 1)
    # drain_partition is a per-Fetch-page generator (r12): rows flow
    # to Spark page by page, so memory stays bounded by max_bytes no
    # matter how fat the partition slice is
    include_headers = getattr(p, "include_headers", False)
    for page in drain_partition(
        p.host, p.port, p.topic, p.partition,
        start_offset=p.start, max_bytes=p.max_bytes,
        end_offset=p.end, include_headers=include_headers,
    ):
        for key, value, topic, part, off, ts_ms, ts_type, *hdrs in page:
            # naive-UTC datetime, matching pd.to_datetime(unit="ms")
            # in kafka_wire's segment source so both faces of the wire
            # frame produce bit-identical timestamps (session tz UTC)
            row = (
                key, value, topic, part, off,
                epoch + datetime.timedelta(milliseconds=ts_ms),
                ts_type,
            )
            if include_headers:
                # struct cells must be tuples for the DataSource row
                # path (dicts are read as maps)
                row += ([
                    (h["key"], h["value"]) for h in hdrs[0]
                ],)
            yield row


def _options(
    opts,
) -> tuple[str, int, str, int, str, int | None, bool]:
    host = opts.get("host")
    port = opts.get("port")
    topic = opts.get("topic")
    if not (host and port and topic):
        raise ValueError(
            "kafka_tcp needs .option('host', …).option('port', …)"
            ".option('topic', …)"
        )
    max_bytes = int(opts.get("maxbytes", 1 << 20))
    starting = str(opts.get("startingoffsets", "earliest")).lower()
    if starting not in ("earliest", "latest"):
        raise ValueError(
            f"startingoffsets must be earliest|latest, got {starting!r}"
        )
    ts = opts.get("startingtimestamp")
    include_headers = _include_headers(opts)
    return host, int(port), topic, max_bytes, starting, (
        int(ts) if ts is not None else None
    ), include_headers


def _include_headers(opts) -> bool:
    return str(opts.get("includeheaders", "false")).lower() == "true"


def _anchor_offsets(
    host: str,
    port: int,
    topic: str,
    parts: list[int],
    starting: str,
    ts: int | None,
) -> dict[int, int]:
    """Start offsets per partition: a ``startingtimestamp`` (epoch ms,
    the stock connector's startingOffsetsByTimestamp shape) asks
    ListOffsets(ts) — partitions where no record qualifies (-1, the
    wire contract) anchor at LATEST, exactly how real consumers treat
    it; otherwise the earliest/latest sentinel."""
    from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb

    if ts is not None:
        found = kb.list_offsets(host, port, topic, parts, ts)
        unresolved = [p for p in parts if found[p] < 0]
        if unresolved:  # only pay the LATEST round trip when needed
            latest = kb.list_offsets(
                host, port, topic, unresolved, kb.LATEST
            )
            found.update(latest)
        return {p: int(found[p]) for p in parts}
    return kb.list_offsets(
        host, port, topic, parts,
        kb.EARLIEST if starting == "earliest" else kb.LATEST,
    )


def _discover(host: str, port: int, topic: str) -> list[int]:
    from dst_spark_k8_lakehouse_spark.sources.kafka_broker import (
        request_metadata,
    )

    meta = request_metadata(host, port, [topic])
    t = next((x for x in meta["topics"] if x["name"] == topic), None)
    if t is None or t["error"]:
        raise ValueError(f"topic {topic!r} unknown to {host}:{port}")
    return sorted(p["partition"] for p in t["partitions"])


class _BatchReader(DataSourceReader):
    def __init__(self, opts) -> None:
        (self.host, self.port, self.topic, self.max_bytes,
         starting, ts, self.include_headers) = _options(opts)
        from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb

        parts = _discover(self.host, self.port, self.topic)
        lo = _anchor_offsets(
            self.host, self.port, self.topic, parts, starting, ts
        )
        hi = kb.list_offsets(
            self.host, self.port, self.topic, parts, kb.LATEST
        )
        self.ranges = [(p, lo[p], hi[p]) for p in parts]

    def partitions(self):
        return [
            _TcpPartition(
                self.host, self.port, self.topic, p, lo, hi,
                self.max_bytes, self.include_headers,
            )
            for p, lo, hi in self.ranges
        ]

    def read(self, partition: _TcpPartition):
        return _read_tcp_partition(partition)


class _StreamReader(DataSourceStreamReader):
    """Offsets are ``{str(partition): next_offset}``; every planned
    micro-batch unit is a CLOSED range, so checkpoint replay reads
    identical rows."""

    def __init__(self, opts) -> None:
        (self.host, self.port, self.topic, self.max_bytes,
         starting, ts, self.include_headers) = _options(opts)
        self._parts = _discover(self.host, self.port, self.topic)
        anchor = _anchor_offsets(
            self.host, self.port, self.topic, self._parts,
            starting, ts,
        )
        self._initial = {str(p): int(anchor[p]) for p in self._parts}

    def initialOffset(self):  # noqa: N802
        return dict(self._initial)

    def latestOffset(self):  # noqa: N802
        from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb

        # re-discover each micro-batch (the stock connector's
        # behavior): a topic that gains partitions mid-stream starts
        # contributing at the next latestOffset call instead of being
        # silently never read; partitions() anchors keys that are new
        # to the offset dict at EARLIEST so their whole log is read
        discovered = _discover(self.host, self.port, self.topic)
        if discovered != self._parts:
            self._parts = discovered
        hwm = kb.list_offsets(
            self.host, self.port, self.topic, self._parts, kb.LATEST
        )
        return {str(p): int(hwm[p]) for p in self._parts}

    def partitions(self, start, end):
        from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb

        # a partition present in `end` but absent from `start` was
        # discovered mid-stream: anchor it at EARLIEST (its log
        # start), the consumer contract for a new partition
        unseen = [
            p for p in self._parts
            if str(p) in end and str(p) not in start
        ]
        anchors = (
            kb.list_offsets(
                self.host, self.port, self.topic, unseen, kb.EARLIEST
            )
            if unseen else {}
        )
        out = []
        for p in self._parts:
            lo = int(start.get(str(p), anchors.get(p, 0)))
            hi = int(end.get(str(p), lo))
            if hi > lo:
                out.append(
                    _TcpPartition(
                        self.host, self.port, self.topic, p, lo, hi,
                        self.max_bytes, self.include_headers,
                    )
                )
        return out

    def read(self, partition: _TcpPartition):
        return _read_tcp_partition(partition)

    def commit(self, end) -> None:
        pass  # the broker holds no consumer state for this reader


@dataclass
class _ProduceAck(WriterCommitMessage):
    """Per-task receipt: [(partition, base_offset, n_records), …]."""

    acks: list = field(default_factory=list)


class _TcpWriter(DataSourceWriter):
    """WRITE face (r12): each task opens ONE socket and produces its
    rows in per-partition ``batchrecords``-bounded chunks (Produce
    v3, broker-assigned offsets). Rows need a ``value`` column;
    ``key`` / ``partition`` (default 0) / ``timestamp_ms`` are
    optional. Delivery is AT-LEAST-ONCE — a retried task re-produces
    its rows, the stock non-transactional kafka sink's contract;
    exactly-once pipelines keep using ``stream_to_delta``-style
    idempotent sinks downstream."""

    def __init__(self, opts, schema: T.StructType) -> None:
        host = opts.get("host")
        port = opts.get("port")
        topic = opts.get("topic")
        if not (host and port and topic):
            raise ValueError(
                "kafka_tcp write needs .option('host', …)"
                ".option('port', …).option('topic', …)"
            )
        # NOTE (fixture-peer caveat, same as write_kafka_topic): the
        # engine's SegmentResponder serves one connection at a time —
        # each write task here holds one socket for its lifetime, so
        # against the fixture concurrent tasks serialize and an idle
        # task can hit the responder's 30 s recv timeout; a real
        # broker multiplexes and this per-task-socket shape is the
        # stock sink's.
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"kafka_tcp write needs a value column, got {names}"
            )
        self.host, self.port, self.topic = host, int(port), topic
        self.batch_records = int(opts.get("batchrecords", 500))
        self.compression = str(opts.get("compression", "none"))
        self.has = set(names)

    def write(self, iterator) -> _ProduceAck:
        import socket as _socket

        from dst_spark_k8_lakehouse_spark.sources.kafka_broker import (
            produce_on,
        )
        from dst_spark_k8_lakehouse_spark.sources.kafka_wire import (
            encode_record_batch,
        )

        def _bytes(v):
            if v is None or isinstance(v, (bytes, bytearray)):
                return None if v is None else bytes(v)
            return str(v).encode()

        acks: list[tuple[int, int, int]] = []
        bufs: dict[int, list[dict]] = {}
        with _socket.create_connection(
            (self.host, self.port), timeout=30
        ) as sock:
            def _flush(part: int) -> None:
                recs = bufs.pop(part, [])
                if not recs:
                    return
                base = produce_on(
                    sock, self.topic, part,
                    encode_record_batch(
                        recs, compression=self.compression
                    ),
                )
                acks.append((part, base, len(recs)))

            for row in iterator:
                part = (
                    int(row["partition"]) if "partition" in self.has
                    and row["partition"] is not None else 0
                )
                rec = {
                    "key": _bytes(row["key"])
                    if "key" in self.has else None,
                    # a null value passes through as a TOMBSTONE
                    # (the codec supports value=None) — mapping it to
                    # b"" would silently rewrite a delete marker into
                    # an empty record
                    "value": _bytes(row["value"]),
                    "timestamp_ms": int(row["timestamp_ms"])
                    if "timestamp_ms" in self.has
                    and row["timestamp_ms"] is not None else 0,
                    "headers": [
                        (h["key"], h["value"])
                        for h in (row["headers"] or [])
                    ] if "headers" in self.has else [],
                }
                buf = bufs.setdefault(part, [])
                buf.append(rec)
                if len(buf) >= self.batch_records:
                    _flush(part)
            for part in sorted(bufs):
                _flush(part)
        return _ProduceAck(acks)


class _TcpStreamWriter(_TcpWriter, DataSourceStreamWriter):
    # base order matters: _TcpWriter first so its concrete write()
    # resolves ahead of DataSourceStreamWriter's abstract one
    """Streaming sink: the same per-task produce as the batch face,
    once per micro-batch. The peer holds no transaction state, so
    ``commit``/``abort`` are metadata no-ops and the epoch contract
    is at-least-once (a replayed micro-batch re-produces — pair with
    an idempotent consumer or the exactly-once lakehouse sinks when
    duplicates matter)."""

    def commit(self, messages, batchId) -> None:  # noqa: N803
        pass

    def abort(self, messages, batchId) -> None:  # noqa: N803
        pass


class KafkaTcpDataSource(DataSource):
    """``spark.dataSource.register(KafkaTcpDataSource)`` then
    ``spark.read.format("kafka_tcp")`` / ``spark.readStream.format(
    "kafka_tcp")`` with host/port/topic options."""

    @classmethod
    def name(cls) -> str:
        return "kafka_tcp"

    def schema(self) -> T.StructType:
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            KAFKA_WIRE_SCHEMA,
            KAFKA_WIRE_SCHEMA_HEADERS,
        )

        # stock-connector parity: the headers column exists ONLY when
        # .option("includeHeaders", "true") asks for it
        return (
            KAFKA_WIRE_SCHEMA_HEADERS
            if _include_headers(self.options)
            else KAFKA_WIRE_SCHEMA
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(  # noqa: N802
        self, schema: T.StructType
    ) -> DataSourceStreamReader:
        return _StreamReader(self.options)

    def writer(
        self, schema: T.StructType, overwrite: bool
    ) -> DataSourceWriter:
        if overwrite:
            raise ValueError(
                "kafka_tcp is an append-only sink (a log cannot be "
                "overwritten); use .mode('append')"
            )
        return _TcpWriter(self.options, schema)

    def streamWriter(  # noqa: N802
        self, schema: T.StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        return _TcpStreamWriter(self.options, schema)


def register(spark) -> None:
    """Register the source (idempotent) and ship the package so
    executor tasks and the streaming runner can import the client."""
    from dst_spark_k8_lakehouse_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(KafkaTcpDataSource)


# --------------------------------------------------------------------------
# registry query: the STREAMING loopback (S13's stream half)

def _register_query() -> None:
    from dst_spark_k8_lakehouse_spark.exact import sum_sql
    from dst_spark_k8_lakehouse_spark.registry import query

    @query(
        "t10_kafka_tcp_stream",
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
    def t10_kafka_tcp_stream(spark, sf_dir: str):
        """T10 (r11): STRUCTURED STREAMING over the Kafka TCP client —
        ``readStream.format("kafka_tcp")`` against the loopback
        responder, availableNow drain through a checkpoint (offsets =
        per-partition next-offset dicts; 64 KiB Fetch pages force
        multi-page micro-batch units), parsed and aggregated, value-
        checked against the relational oracle. With s13_kafka_wire
        (bytes) and s13_kafka_tcp (socket), this closes S13's stream
        half: the full ``format("kafka")`` consumer surface — batch,
        stream, offsets, pagination — jar-free."""
        import tempfile

        from pyspark.sql import functions as F

        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.sources.kafka_broker import (
            _responder_fixture,
        )
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            parse_kafka_events,
        )

        register(spark)
        responder = _responder_fixture(spark, sf_dir)
        # mkdtemp + atexit (not a with-block): the returned DataFrame
        # is collected AFTER this function returns, and a lost cache
        # block would recompute from the parquet path — the backing
        # files must outlive the query, like every other fixture
        import atexit
        import shutil

        d = tempfile.mkdtemp(prefix="dst-t10-")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        wire = (
            spark.readStream.format("kafka_tcp")
            .option("host", responder.host)
            .option("port", responder.port)
            .option("topic", "events")
            .option("maxbytes", 64 << 10)
            .load()
        )
        q = (
            wire.writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/cp")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError(
                "t10 stream did not drain within 120 s — partial "
                "output would masquerade as a wrong-rows failure"
            )
        drained = spark.read.parquet(f"{d}/out")
        events = parse_kafka_events(drained)
        return events.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
        )


_register_query()


# (sink responder, pipe-consistent flag) per (process, sf_dir): the
# kafka→kafka pipe runs ONCE; repeat calls drain the same sink topic
_PIPE_STATE: dict[str, tuple] = {}


def _register_pipe() -> None:
    from dst_spark_k8_lakehouse_spark.exact import sum_sql
    from dst_spark_k8_lakehouse_spark.registry import query

    @query(
        "t11_kafka_tcp_pipe",
        oracle=f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id,
                   {sum_sql('value')} AS total_value,
                   TRUE AS pipe_ok
            FROM events
            WHERE event_id <= 2000
            GROUP BY event_type
        """,
    )
    def t11_kafka_tcp_pipe(spark, sf_dir: str):
        """T11 (r12): the kafka→kafka STREAMING PIPE — the mirror/
        replication topology every Kafka deployment runs —
        end-to-end on this engine's own stack: ``readStream.format(
        "kafka_tcp")`` from the fixture peer → checkpointed
        availableNow micro-batches → ``writeStream.format(
        "kafka_tcp")`` producing into a SECOND live peer (Produce v3,
        broker-assigned offsets) → the SINK topic drained back over
        Fetch v4 (CRC verified), parsed, aggregated, value-checked.
        ``pipe_ok`` folds no-dup/no-loss across the hop into the
        hash: the sink's per-partition high watermarks equal the
        source's row counts. The stock-stack equivalent needs the
        spark-sql-kafka jar twice and two brokers; this is the same
        pipe jar-free against two sockets."""
        import os
        import tempfile

        from pyspark.sql import functions as F

        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.sources import kafka_broker as kb
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            parse_kafka_events,
        )

        register(spark)
        src = kb._responder_fixture(spark, sf_dir)
        got = _PIPE_STATE.get(sf_dir)
        if got is None:
            import atexit
            import shutil

            root = tempfile.mkdtemp(prefix="dst-t11-sink-")
            atexit.register(shutil.rmtree, root, ignore_errors=True)
            sink = kb.SegmentResponder(root)
            sink.__enter__()
            atexit.register(sink.close)
            cp = tempfile.mkdtemp(prefix="dst-t11-cp-")
            atexit.register(shutil.rmtree, cp, ignore_errors=True)
            wire = (
                spark.readStream.format("kafka_tcp")
                .option("host", src.host)
                .option("port", src.port)
                .option("topic", "events")
                .option("maxbytes", 64 << 10)
                .load()
            )
            shaped = wire.select(
                "key", "value", "partition",
                F.unix_millis("timestamp").alias("timestamp_ms"),
            )
            q = (
                shaped.writeStream.format("kafka_tcp")
                .option("host", sink.host)
                .option("port", sink.port)
                .option("topic", "piped")
                .option("batchrecords", 250)
                .option("checkpointLocation", os.path.join(cp, "cp"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(180):
                q.stop()
                raise RuntimeError(
                    "t11 pipe did not drain within 180 s — a partial "
                    "sink topic would masquerade as wrong rows"
                )
            src_hwm = kb.list_offsets(
                src.host, src.port, "events", [0, 1], kb.LATEST
            )
            sink_hwm = kb.list_offsets(
                sink.host, sink.port, "piped", [0, 1], kb.LATEST
            )
            ok = sink_hwm == src_hwm  # no dup, no loss, per partition
            _PIPE_STATE[sf_dir] = (sink, ok)
        sink, ok = _PIPE_STATE[sf_dir]
        piped = kb.read_kafka_topic(
            spark, sink.host, sink.port, "piped", max_bytes=64 << 10
        )
        events = parse_kafka_events(piped)
        return events.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
            F.first(F.lit(bool(ok))).alias("pipe_ok"),
        )


_register_pipe()


def _register_capstone() -> None:
    from dst_spark_k8_lakehouse_spark.exact import sum_sql
    from dst_spark_k8_lakehouse_spark.registry import query

    @query(
        "x13_tcp_bronze",
        oracle=f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id,
                   {sum_sql('value')} AS total_value,
                   TRUE AS exactly_once
            FROM events
            WHERE event_id <= 2000
            GROUP BY event_type
        """,
    )
    def x13_tcp_bronze(spark, sf_dir: str):
        """CAPSTONE (r11): the canonical bronze-ingest pipeline,
        end-to-end on this engine's own stack — a LIVE Kafka-protocol
        peer over TCP → ``readStream.format("kafka_tcp")``
        (per-partition checkpointed offsets) → ``parse_kafka_events``
        → ``stream_to_delta`` (foreachBatch + SetTransaction
        exactly-once watermarks) → the bronze table read back through
        the jar-free protocol replay reader and aggregated,
        value-checked against the relational oracle. ``exactly_once``
        folds three properties into the hash: the bronze row count is
        exactly the fixture's (no dup, no loss), a deliberate RETRY
        of the last micro-batch with its committed (app, batch) txn
        is SKIPPED by the watermark, and the log state actually
        carries the txn row. The stock-stack equivalent (kafka →
        spark-sql-kafka → delta-spark) needs two jar families and a
        broker; this is the same pipeline jar-free against a
        socket."""
        import os
        import tempfile

        from pyspark.sql import functions as F

        from dst_spark_k8_lakehouse_spark import exact
        from dst_spark_k8_lakehouse_spark.plans import (
            delta_reader,
            delta_writer,
        )
        from dst_spark_k8_lakehouse_spark.sources.kafka_broker import (
            _responder_fixture,
        )
        from dst_spark_k8_lakehouse_spark.streaming.delta_sink import (
            stream_to_delta,
        )
        from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
            EVENTS_STREAM_SCHEMA,
            parse_kafka_events,
        )

        register(spark)
        responder = _responder_fixture(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="dst-x13-")
        import atexit
        import shutil

        atexit.register(shutil.rmtree, base, ignore_errors=True)
        table = os.path.join(base, "bronze")
        delta_writer.create_delta(
            spark.createDataFrame([], EVENTS_STREAM_SCHEMA), table
        )
        wire = (
            spark.readStream.format("kafka_tcp")
            .option("host", responder.host)
            .option("port", responder.port)
            .option("topic", "events")
            .option("maxbytes", 64 << 10)
            .load()
        )
        app = "x13-bronze"
        q = stream_to_delta(
            parse_kafka_events(wire), table,
            os.path.join(base, "cp"), app_id=app,
        )
        if not q.awaitTermination(180):
            q.stop()
            raise RuntimeError(
                "x13 stream did not drain within 180 s — a partial "
                "bronze table would masquerade as a wrong-rows failure"
            )
        bronze = delta_reader.read_delta(spark, table)
        n_after_stream = bronze.count()
        # at-least-once delivery simulation: re-append rows under the
        # HIGHEST COMMITTED (app, batch) — the SetTransaction watermark
        # must skip it or the oracle's exact row-set match breaks
        state = delta_reader._replay(spark, table, None)
        if app not in state.get("txns", {}):
            raise RuntimeError(
                f"x13 bronze log carries no SetTransaction row for "
                f"{app!r} — the stream committed zero micro-batches"
            )
        last_batch = int(state["txns"][app])
        delta_writer.append_delta(
            bronze.limit(50), table, txn=(app, last_batch)
        )
        n_after_retry = delta_reader.read_delta(spark, table).count()
        from dst_spark_k8_lakehouse_spark.sources.catalog import (
            load_table,
        )

        n_expected = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") <= 2000)
            .count()
        )
        ok = (
            n_after_stream == n_expected  # no dup, no loss
            and n_after_retry == n_expected  # the retry was SKIPPED
            and last_batch >= 0  # the txn watermark is in log state
        )
        return bronze.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            exact.exact_sum("value").alias("total_value"),
            F.first(F.lit(bool(ok))).alias("exactly_once"),
        )


_register_capstone()
