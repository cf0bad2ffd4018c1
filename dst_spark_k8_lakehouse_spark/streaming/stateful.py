"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference platform's streaming story is the stock Structured
Streaming surface (SURVEY §2.10); this module is the CUSTOM-state tier
the brief's training pipelines need — per-key state the built-in
windows/dedup operators can't express, held in Spark's state store
across micro-batches and checkpoint restarts.

Two APIs exist in Spark 4 for this. ``transformWithStateInPandas``
(T9) is env-gated here: its driver-side worker imports
``google.protobuf``, absent from this container (re-tried 2026-08-16;
``streaming/pipelines.py`` pins the loud refusal).
``applyInPandasWithState`` — the Spark 3.4+ API, same state-store
machinery, Arrow-batched user function, no protobuf dependency —
WORKS, so the custom-stateful capability ships on it.

WHY at 100 TB: state lives in the executor state store partitioned by
key (one shuffle on the grouping key per batch, the same cost class
as any streaming agg); the user function sees one key's rows per call
as Arrow-batched pandas, so per-key logic is vectorized and state
size is bounded by keys, never events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def running_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key RUNNING totals across micro-batches — a custom stateful
    operator no built-in expresses (a streaming groupBy in update mode
    emits per-batch aggregates but exposes no per-key update COUNT;
    this keeps ``(n_events, total_cents, n_batches)`` in explicit
    state and emits the cumulative row on every batch a key appears
    in).

    Values accumulate as integer CENTS (``exact.cents`` convention:
    exact LONG sums, order-independent, oracle-comparable); emission
    is one row per (key, contributing batch) in update mode — the
    LATEST row per key (max ``n_batches``) is the current state, so a
    consumer folding the sink takes per-key maxima. State persists in
    the checkpoint: a restarted query CONTINUES the totals instead of
    resetting (pytest-pinned)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        n, cents, batches = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            # exact.cents convention: values are 2-decimal doubles, so
            # v*100 is within 1 ulp of an integer and never near a
            # rounding tie — int(round()) is exact and bankers-safe
            cents += int(
                pdf[value_col].mul(100).round().astype("int64").sum()
            )
        batches += 1
        state.update((n, cents, batches))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "n_batches": [batches],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            RUNNING_TOTALS_SCHEMA,
            _RUNNING_STATE_SCHEMA,
            "Update",
            GroupStateTimeout.NoTimeout,
        )
    )
