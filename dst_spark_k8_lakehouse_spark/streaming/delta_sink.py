"""Structured-Streaming sink onto NATIVE (jar-free) Delta logs with
EXACTLY-ONCE batch semantics.

This is the streaming half of the reference's metrics write path
(``modules/dst_metrics/spark_logger.py`` appends every event to a
Delta table; a streaming job doing the same must survive micro-batch
retries): ``foreachBatch`` appends each micro-batch through
``delta_writer.append_delta`` with ``txn=(app_id, batch_id)`` — the
Delta spec's ``SetTransaction`` action. The log records the highest
committed batch per app; a RETRIED micro-batch (same batch_id, the
at-least-once case Structured Streaming documents for foreachBatch)
finds its watermark already present and skips, so the table state is
exactly-once without content-based dedup. The watermark survives
checkpointing (``write_checkpoint`` carries ``txn`` rows) and commit
races (the skip check re-runs inside the optimistic-retry loop).

Scale note: one log commit per micro-batch — the same commit cadence
real Delta streaming sinks produce; log replay stays O(live files)
via checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dst_spark_k8_lakehouse_spark.plans import delta_reader, delta_writer


def stream_to_delta(
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    merge_schema: bool = False,
):
    """Start an availableNow ``foreachBatch`` append stream into a
    native Delta log (the table must exist — create it with
    ``delta_writer.create_delta``; an explicit create pins the schema
    instead of inferring it from whichever batch arrives first).
    Returns the ``StreamingQuery``; call ``awaitTermination()``."""
    if not delta_reader.is_delta_table(table):
        raise ValueError(
            f"no Delta table at {table}; create_delta it first"
        )
    app = app_id or f"stream-to-delta:{table}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta_writer.append_delta(
            batch_df, table, merge_schema=merge_schema,
            txn=(app, int(batch_id)),
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
