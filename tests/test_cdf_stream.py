"""CHANGE DATA FEED through the delta_native DataSource:
``.option("readChangeFeed", "true")`` on batch and streaming reads.
The batch DataSource read is pinned row-for-row to the library
``read_change_feed`` (the two implementations share the
``change_units`` planner — this test keeps them honest), and the
stream drains change sets incrementally across checkpointed runs,
including the DML commits a plain stream refuses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_cdf as cdf
from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv as dv
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.sources import delta_source


@pytest.fixture()
def registered(spark):
    delta_source.register(spark)
    return spark


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def _rows(df):
    return {
        (r.id, r.x, r._change_type, r._commit_version)
        for r in df.collect()
    }


def _mutated_table(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 0, 6), table)            # v0
    cdf.enable_cdf(spark, table)                        # v1
    dml.update_delta(spark, table, "id = 2", {"x": "99.0"})   # v2
    dml.delete_delta(spark, table, "id >= 4")           # v3
    return table


def test_batch_datasource_matches_library(registered, tmp_path):
    spark = registered
    table = _mutated_table(spark, tmp_path)
    via_ds = (
        spark.read.format("delta_native")
        .option("readChangeFeed", "true")
        .load(table)
    )
    via_lib = cdf.read_change_feed(spark, table)
    assert _rows(via_ds) == _rows(via_lib)
    assert len(_rows(via_ds)) == 6 + 2 + 2  # inserts + upd pair + dels
    # version-bounded batch read
    bounded = (
        spark.read.format("delta_native")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)
        .option("endingVersion", 2)
        .load(table)
    )
    assert _rows(bounded) == {
        (2, 4.0, "update_preimage", 2),
        (2, 99.0, "update_postimage", 2),
    }


def _drain(spark, table, ck):
    got: set = set()

    def sink(batch_df, _bid):
        got.update(
            (r.id, r.x, r._change_type, r._commit_version)
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_native")
        .option("readChangeFeed", "true")
        .load(table)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.exception():
        raise q.exception()
    return got


def test_stream_drains_changes_incrementally(registered, tmp_path):
    spark = registered
    table = _mutated_table(spark, tmp_path)
    ck = str(tmp_path / "ck")
    first = _drain(spark, table, ck)
    assert first == _rows(cdf.read_change_feed(spark, table))
    # more DML: the checkpointed stream picks up ONLY the new commits
    dml.update_delta(spark, table, "id = 0", {"x": "-1.0"})   # v4
    second = _drain(spark, table, ck)
    assert second == {
        (0, 0.0, "update_preimage", 4),
        (0, -1.0, "update_postimage", 4),
    }
    # nothing new: empty drain
    assert _drain(spark, table, ck) == set()


def test_stream_handles_dv_deletes(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "dvt")
    dw.create_delta(_df(spark, 0, 8).coalesce(1), table)
    ck = str(tmp_path / "ck")
    assert len(_drain(spark, table, ck)) == 8  # creation inserts
    dv.delete_where_dv(spark, table, "id < 2")
    dv.delete_where_dv(spark, table, "id = 2")
    got = _drain(spark, table, ck)
    assert got == {
        (0, 0.0, "delete", 1),
        (1, 2.0, "delete", 1),
        (2, 4.0, "delete", 2),
    }


def test_partitioned_whole_file_delete_keeps_partition_values(
    registered, tmp_path
):
    """A bare remove action carries no partitionValues; the planner
    resolves them from the file's add — partition columns must not
    come back null."""
    spark = registered
    table = str(tmp_path / "pt")
    df = _df(spark, 0, 6).withColumn(
        "g", (F.col("id") % 2).cast("int")
    )
    dw.create_delta(df, table, partition_by=["g"])
    dml.delete_delta(spark, table, "g = 1")  # whole-partition drop
    feed = (
        spark.read.format("delta_native")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(table)
    )
    got = {(r.id, r.g, r._change_type) for r in feed.collect()}
    assert got == {(i, 1, "delete") for i in (1, 3, 5)}
