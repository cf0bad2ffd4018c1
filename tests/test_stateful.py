"""Custom stateful streaming via ``applyInPandasWithState``
(``streaming/stateful.py``): cross-batch state, exact cents
accumulation, and checkpoint-restart continuity."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.streaming.pipelines import (
    run_available_now,
)
from dst_spark_k8_lakehouse_spark.streaming.stateful import (
    running_totals,
)

SCHEMA = "k string, value double"


def _write_file(spark, d, i, rows):
    tmp = os.path.join(d, f"w{i}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = os.path.join(d, "in", f"{i:02d}.parquet")
    shutil.move(part, dst)
    os.utime(dst, (1_700_000_000 + i * 100,) * 2)


def _stream(spark, d):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "in"))
    )


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    """Three one-file micro-batches: state carries totals across them
    (a stateless per-batch agg would emit 3 independent rows; the
    final state row holds the CUMULATIVE n/cents/batches). Keys
    absent from a batch keep their state untouched."""
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "in"))
    _write_file(spark, d, 0, [("a", 1.25), ("a", 2.00), ("b", 0.10)])
    _write_file(spark, d, 1, [("a", 0.75)])
    _write_file(spark, d, 2, [("b", 9.90), ("c", 5.00)])
    out = running_totals(_stream(spark, d), "k", "value")
    run_available_now(out, "t12_sink_a", os.path.join(d, "ck"), "update")
    rows = {
        (r["key"], r["n_batches"]): (r["n_events"], r["total_cents"])
        for r in spark.table("t12_sink_a").collect()
    }
    # one emission per (key, contributing batch), all cumulative
    assert rows[("a", 1)] == (2, 325)
    assert rows[("a", 2)] == (3, 400)
    assert rows[("b", 1)] == (1, 10)
    assert rows[("b", 2)] == (2, 1000)
    assert rows[("c", 1)] == (1, 500)
    assert len(rows) == 5  # no emission for absent keys


def test_running_totals_survive_checkpoint_restart(spark, tmp_path):
    """A SECOND query over the same checkpoint CONTINUES the state —
    a restart must not reset the totals (the property that makes the
    operator a real stateful pipeline stage, not a per-run agg). The
    memory sink can't recover from a checkpoint, so the restartable
    runs go through a foreachBatch parquet sink."""
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "in"))
    ck = os.path.join(d, "ck")
    sink_dir = os.path.join(d, "out")

    def run_once():
        out = running_totals(_stream(spark, d), "k", "value")

        def sink(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_file(spark, d, 0, [("a", 1.00), ("a", 1.00)])
    run_once()
    first = spark.read.parquet(sink_dir).collect()
    assert [(r["n_events"], r["total_cents"], r["n_batches"])
            for r in first] == [(2, 200, 1)]
    # new data arrives, new query run, SAME checkpoint
    _write_file(spark, d, 1, [("a", 0.50)])
    run_once()
    rows = sorted(
        (r["n_batches"], r["n_events"], r["total_cents"])
        for r in spark.read.parquet(sink_dir).collect()
    )
    # the restarted run CONTINUED: cumulative row, not a reset
    assert rows == [(1, 2, 200), (2, 3, 250)]


def test_running_totals_exact_cents(spark, tmp_path):
    """Value accumulation follows the exact.cents convention: sums
    are exact LONG cents, never drifting double adds."""
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "in"))
    # 0.1 + 0.2 famously != 0.3 in doubles; in cents it is exactly 30
    _write_file(spark, d, 0, [("a", 0.10), ("a", 0.20)])
    out = running_totals(_stream(spark, d), "k", "value")
    run_available_now(out, "t12_sink_c", os.path.join(d, "ck"), "update")
    (row,) = spark.table("t12_sink_c").collect()
    assert row["total_cents"] == 30


def test_t12_query_matches_batch_expectation(spark):
    """The registry query's n_batches_seen equals the batch-computed
    count of distinct event_id%4 buckets per type at sf0.001."""
    from dst_spark_k8_lakehouse_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_events"], r["n_batches_seen"])
        for r in registry.QUERIES["t12_stateful_running_agg"](
            spark, sf
        ).collect()
    }
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    exp = {
        r["event_type"]: (r["n"], r["nb"])
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(F.col("event_id") % 4).alias("nb"),
        )
        .collect()
    }
    assert got == exp


def _run_sessionize(spark, d, files, gap_minutes=60):
    """Write `files` (lists of (user, ts_str, value, event_id)) as a
    pinned-order stream and drain the sessionizer's emissions."""
    import uuid

    from dst_spark_k8_lakehouse_spark.streaming.stateful import (
        sessionize,
    )

    import datetime as dt

    base = os.path.join(d, f"run-{uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(base, "in"))
    schema = "user_id long, ts timestamp, value double, event_id long"

    def _parse(rows):
        return [
            (u, dt.datetime.fromisoformat(ts) if isinstance(ts, str)
             else ts, v, e)
            for u, ts, v, e in rows
        ]

    for i, rows in enumerate(files):
        tmp = os.path.join(base, f"w{i}")
        spark.createDataFrame(_parse(rows), schema).coalesce(1) \
            .write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = os.path.join(base, "in", f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    stream = (
        spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "in"))
    )
    out = sessionize(stream, "user_id", "ts", "value", "event_id",
                     gap_minutes)
    name = f"t13_sink_{uuid.uuid4().hex[:8]}"
    run_available_now(out, name, os.path.join(base, "ck"), "update")
    return sorted(
        (r["key"], r["session_id"], r["n_events"],
         str(r["session_start"]), str(r["session_end"]),
         r["total_cents"])
        for r in spark.table(name).collect()
    )


def test_sessionize_closes_across_batch_boundary(spark, tmp_path):
    """A session straddling a batch boundary folds (open state +
    first local run merge); the next gap closes it exactly once."""
    d = str(tmp_path)
    rows = _run_sessionize(spark, d, [
        # batch 0: one session (10:00-10:30), still open at the cut
        [(1, "2024-01-01 10:00:00", 1.00, 1),
         (1, "2024-01-01 10:30:00", 2.00, 2)],
        # batch 1: 10:50 is within gap -> folds into the OPEN session;
        # 13:00 breaks -> session 0 closes (3 events, 10:00-10:50)
        [(1, "2024-01-01 10:50:00", 0.50, 3),
         (1, "2024-01-01 13:00:00", 9.00, 4)],
    ])
    assert rows == [
        (1, 0, 3, "2024-01-01 10:00:00", "2024-01-01 10:50:00", 350),
    ]  # the 13:00 session stays open, never emitted


def test_sessionize_boundary_break_closes_carried_state(spark, tmp_path):
    """When the batch's FIRST row already exceeds the gap, the carried
    open session closes AS-IS (no fold) and ordinals stay sequential."""
    d = str(tmp_path)
    rows = _run_sessionize(spark, d, [
        [(7, "2024-01-01 08:00:00", 1.00, 1)],
        # first row of batch 1 breaks; then an in-batch break too
        [(7, "2024-01-01 12:00:00", 2.00, 2),
         (7, "2024-01-01 15:00:00", 4.00, 3)],
    ])
    assert rows == [
        (7, 0, 1, "2024-01-01 08:00:00", "2024-01-01 08:00:00", 100),
        (7, 1, 1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 200),
    ]


def test_sessionize_emitted_set_is_batch_split_invariant(spark, tmp_path):
    """The same time-ordered events produce the SAME emitted sessions
    whether they arrive as one batch, two, or one-per-event — the
    property the t13 oracle's relational twin relies on."""
    import datetime as dt

    d = str(tmp_path)
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    events = []
    eid = 0
    for u in (1, 2):
        t = base
        for sess in range(3):
            for j in range(2 + sess):
                events.append(
                    (u, str(t), float(u + sess), eid)
                )
                eid += 1
                t += dt.timedelta(minutes=20)
            t += dt.timedelta(hours=3)  # gap -> new session
    events.sort(key=lambda r: (r[1], r[3]))
    one = _run_sessionize(spark, d, [events])
    halves = _run_sessionize(
        spark, d, [events[: len(events) // 2],
                   events[len(events) // 2:]],
    )
    singles = _run_sessionize(spark, d, [[e] for e in events])
    assert one == halves == singles
    # 2 users x 3 sessions, last per user open: 4 emitted
    assert len(one) == 4
