"""Structured Streaming pipelines (SURVEY §2.10 T4-T5 + stateful ops).

Real ``readStream`` → transform → ``writeStream`` flows over the same
window expressions as ``streaming/windows.py``. None of this is
oracle-checkable (late-data/state semantics have no batch-SQL
equivalent) — integration tests drive it with ``availableNow`` triggers
and assert the sink contents.

Late-data posture: every event-time aggregation takes a watermark; the
state store drops windows older than (max event time − watermark), so
state is bounded and late rows beyond the watermark are discarded —
Spark's documented contract, which we adopt unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a parquet directory of events. Streaming
    file sources require an explicit schema (no inference at plan time)
    — same posture as the reference's explicit-StructType rule
    (``modules/dst_metrics/spark_logger.py:14``)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(events_dir)


# The exact frame shape spark.readStream.format("kafka") produces —
# S13's wire contract. The broker connection is untestable in this
# container; everything AFTER the source node (deserialize → typed
# events → the window/watermark pipelines above) is real, tested code.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_events_source(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """S13: Kafka source wiring — returns the raw wire-schema stream.
    Compose with ``parse_kafka_events`` and any pipeline above. (Needs
    the spark-sql-kafka package and a reachable broker; the transform
    layer is covered by tests via synthetic wire frames.)"""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Deserialize a Kafka wire-schema frame (batch or streaming) into
    the typed events stream: ``CAST(value AS STRING)`` → ``from_json``
    with the explicit events schema → flatten. Malformed payloads
    surface as a null ``event_id`` (from_json PERMISSIVE mode) so a
    downstream filter can quarantine instead of killing the stream —
    drop-late-and-malformed is a pipeline policy, not an engine crash.
    """
    return (
        raw.select(
            F.from_json(
                F.col("value").cast("string"), EVENTS_STREAM_SCHEMA
            ).alias("e")
        )
        .select("e.*")
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1+T4: watermarked tumbling-window counts — the streaming twin of
    ``t1_tumbling``; append-mode emits a window only once it closes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "10 minutes"
) -> DataFrame:
    """T5: stateful streaming dedup — drops repeats of ``keys`` arriving
    within the watermark horizon; state for keys older than the
    watermark is evicted (bounded memory, unlike a global distinct)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count + value total across micro-batches. The state
    row is two numbers per user — the pattern for any custom accumulator
    Spark's built-in aggs can't express (decayed counters, CDC merge,
    fraud scores...). Update-mode output, one row per user per batch."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available into an in-memory sink and
    stop — the batch-like trigger used by tests and backfills. The
    result is readable as ``spark.table(query_name)``. Pick the output
    mode per operator: append (stateless / closed windows only),
    update (stateful operators), complete (full agg table)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def foreach_batch_append(
    df: DataFrame, target_dir: str, checkpoint_dir: str
) -> None:
    """T-sink: ``foreachBatch`` bridge into a plain parquet directory,
    effectively-once: each micro-batch OVERWRITES its own
    ``batch_id=<n>`` partition directory, so a batch retried after a
    crash between the sink write and the checkpoint commit replaces its
    previous (possibly partial) output instead of appending duplicate
    rows. Readers see ``batch_id`` as a normal discovered partition
    column (provenance: which micro-batch produced each row)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{target_dir}/batch_id={batch_id}"
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_stream_batch_to_table(
    batch_df: DataFrame, batch_id: int, table_path: str
) -> bool:
    """Idempotent ``foreachBatch`` body for the versioned table sink:
    the snapshot commit records ``stream_batch_id`` (the analog of
    Delta's ``txn`` action), and a batch whose id is already committed
    is skipped — so a retry after a crash between the table commit and
    the checkpoint commit does not produce a duplicate snapshot.
    Returns True if the batch was written, False if skipped."""
    import os

    from dst_spark_k8_lakehouse_spark.plans import VersionedTable

    table = VersionedTable(batch_df.sparkSession, table_path)
    props = {"stream_batch_id": batch_id}
    if os.path.exists(table._manifest_path()):
        if batch_id in table.committed_props("stream_batch_id"):
            return False
        table.append(batch_df, props)
    else:
        table.create(batch_df, props)
    return True


def foreach_batch_to_table(
    df: DataFrame, table_path: str, checkpoint_dir: str
) -> None:
    """T-sink: ``foreachBatch`` into the versioned lakehouse layer —
    each micro-batch becomes one time-travellable table snapshot
    (append, schema-merging). Effectively-once end to end: the
    checkpoint skips batches the stream knows are done, and
    ``write_stream_batch_to_table`` skips batches the TABLE knows are
    done (snapshot-recorded ``stream_batch_id``), covering the
    crash-between-sink-commit-and-checkpoint-commit window."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_stream_batch_to_table(batch_df, batch_id, table_path)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
