"""Structured-Streaming sink onto NATIVE (jar-free) Iceberg tables
with EXACTLY-ONCE batch semantics — the Iceberg twin of
``streaming/delta_sink`` (t6's surface).

``foreachBatch`` appends each micro-batch through
``iceberg_writer.append_iceberg`` with ``txn=(app_id, batch_id)``:
the epoch watermark rides the SNAPSHOT SUMMARY (exactly how real
streaming engines make Iceberg commits replay-safe — Flink records
its checkpoint id there, Spark's runtime its epoch), so a RETRIED
micro-batch (the at-least-once case foreachBatch documents) finds its
epoch already committed and skips. Hidden-partitioned targets work:
an append into a ``days(ts)`` table groups the batch by day through
the transform writer.

Scale note: one snapshot per micro-batch — the commit cadence real
Iceberg streaming sinks produce; ``expire_snapshots`` bounds the
history, and the watermark scan is a driver-side walk of snapshot
summaries (metadata-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dst_spark_k8_lakehouse_spark.plans import iceberg_reader, iceberg_writer


def stream_to_iceberg(
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    branch: str | None = None,
):
    """Start an availableNow ``foreachBatch`` append stream into a
    native Iceberg table (the table must exist — create it with
    ``iceberg_writer.create_iceberg``; an explicit create pins the
    schema and the partition spec). Returns the ``StreamingQuery``;
    call ``awaitTermination()``.

    ``branch`` stages every micro-batch on a named branch instead of
    main — streaming write-audit-publish (real Iceberg's
    ``spark.wap.branch`` applies to streams the same way): downstream
    readers of main see nothing until ``fast_forward`` publishes; the
    exactly-once ``txn`` watermark rides the branch snapshots'
    summaries unchanged, so a retried micro-batch is a no-op on the
    branch too."""
    if not iceberg_reader.is_iceberg_table(table):
        raise ValueError(
            f"no Iceberg table at {table}; create_iceberg it first"
        )
    app = app_id or f"stream-to-iceberg:{table}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        iceberg_writer.append_iceberg(
            batch_df, table, txn=(app, int(batch_id)), branch=branch
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
