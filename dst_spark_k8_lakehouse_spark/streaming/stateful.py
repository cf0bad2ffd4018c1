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


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

# (next session ordinal, open session: start/last epoch-us, n, cents)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_sid", T.LongType()),
        T.StructField("open_start_us", T.LongType()),
        T.StructField("open_last_us", T.LongType()),
        T.StructField("open_n", T.LongType()),
        T.StructField("open_cents", T.LongType()),
    ]
)


def sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    gap_minutes: int,
) -> DataFrame:
    """CUSTOM sessionization with emission-on-close — the canonical
    ``applyInPandasWithState`` workload (the shape the T9 row names:
    per-key sessions whose state must STRADDLE micro-batches).

    A session is a maximal run of a key's events where each
    consecutive pair is ≤ ``gap_minutes`` apart (strictly-greater gap
    breaks). Sessions are CLOSED — and emitted, exactly once — when a
    later event of the same key proves the gap (possibly batches
    later: the open session rides explicit GroupState meanwhile).
    The stream's final open session per key stays open and is never
    emitted — honest operator semantics (nothing proves it ended),
    and what makes the emitted set batch-split-invariant: for any
    time-ordered arrival, the output is every session except each
    key's last, with 0-based per-key ordinals.

    Per-batch work is VECTORIZED: one sort + diff/cumsum partitions
    the batch into local sessions, one groupby aggregates them — no
    per-row Python loop, so a hot key's cost is O(rows) pandas ops.
    Values accumulate as exact integer cents; timestamps ride state
    as epoch-microseconds LONGs."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def _update(key, pdfs, state):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(
            [ts_col, order_col], kind="mergesort"
        ).reset_index(drop=True)
        ts = pd.to_datetime(batch[ts_col])
        if getattr(ts.dt, "tz", None) is not None:
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        # unit-safe epoch-us: astype('int64') alone would yield
        # whatever resolution the arrow conversion picked (ns vs us)
        ts_us = ts.astype("datetime64[us]").astype("int64")
        cents = batch[value_col].mul(100).round().astype("int64")
        next_sid, o_start, o_last, o_n, o_cents = (
            state.get if state.exists else (0, -1, -1, 0, 0)
        )
        # local session partition: strictly-greater gap breaks; the
        # first row additionally breaks against the OPEN state
        brk = ts_us.diff().gt(gap_us)
        brk.iloc[0] = bool(
            o_last >= 0 and ts_us.iloc[0] - o_last > gap_us
        )
        sess_local = brk.cumsum()
        agg = (
            pd.DataFrame(
                {"s": sess_local, "ts": ts_us, "c": cents}
            )
            .groupby("s", sort=True)
            .agg(
                n=("ts", "size"), start=("ts", "min"),
                last=("ts", "max"), cents=("c", "sum"),
            )
        )
        # fold the open state into the first local session unless the
        # boundary broke (then the open session is CLOSED as-is)
        segments = []  # (start, last, n, cents), time-ordered
        if o_last >= 0 and not brk.iloc[0]:
            first = agg.iloc[0]
            segments.append(
                (o_start, int(first["last"]), o_n + int(first["n"]),
                 o_cents + int(first["cents"]))
            )
            rest = agg.iloc[1:]
        else:
            if o_last >= 0:
                segments.append((o_start, o_last, o_n, o_cents))
            rest = agg
        segments += [
            (int(r["start"]), int(r["last"]), int(r["n"]),
             int(r["cents"]))
            for _i, r in rest.iterrows()
        ]
        *closed, open_seg = segments
        state.update(
            (next_sid + len(closed), open_seg[0], open_seg[1],
             open_seg[2], open_seg[3])
        )
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_id": [
                        next_sid + i for i in range(len(closed))
                    ],
                    "n_events": [s[2] for s in closed],
                    "session_start": pd.to_datetime(
                        [s[0] for s in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [s[1] for s in closed], unit="us"
                    ),
                    "total_cents": [s[3] for s in closed],
                }
            )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            SESSION_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "Update",
            GroupStateTimeout.NoTimeout,
        )
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
