"""Time-window aggregation operators (SURVEY §2.10 T1-T3).

The reference has no streaming surface (grep-verified, SURVEY §1.1); the
``events`` table and the north star mandate one. Spark's window
functions are identical in batch and streaming plans — ``F.window`` /
``F.session_window`` over a static DataFrame produce the same groups a
``readStream`` would, so these queries double as the DuckDB-checkable
core of the streaming layer, while ``streaming/pipelines.py`` wires the
same expressions into real ``readStream``/``writeStream`` flows with
watermarks.

Scale: windowed aggregation shuffles once on (key, window); with
watermarks the streaming state store evicts closed windows, so state is
bounded by (keys × open windows) — the knob that keeps a 100 TB/day
stream in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.exact import exact_sum, sum_sql
from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "t1_tumbling",
    oracle=f"""
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               {sum_sql('value')} AS total_value
        FROM events
        GROUP BY 1
    """,
)
def t1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling 10-minute window aggregation over event time."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "t2_sliding",
    oracle=f"""
        SELECT ws AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               {sum_sql('value')} AS total_value
        FROM (
            SELECT unnest([
                       time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL '5 minutes'
                   ]) AS ws,
                   value
            FROM events
        )
        GROUP BY ws
    """,
)
def t2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: sliding window — 10-minute span every 5 minutes; each event
    lands in exactly 2 windows (the oracle unrolls that membership)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "t3_session",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events
        FROM numbered
        GROUP BY user_id, sid
    """,
)
def t3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: session windows — per-user activity sessions split at ≥5-minute
    gaps. ``F.session_window`` merges events with gap < 5 min (strict);
    the oracle's gaps-and-islands SQL starts a new session at gap ≥ 5 min
    — the same boundary rule. Event times carry microsecond residue, so
    exact-boundary ties don't occur in this data."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "n_events")
    )
