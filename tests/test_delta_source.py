"""format("delta_native") — the Spark Python DataSource over native
Delta logs: batch reads (schema, column mapping, partitions, time
travel), partition-filter pushdown pruning, and micro-batch streaming
that skips compaction commits and refuses data-removing history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.sources import delta_source


@pytest.fixture(scope="module")
def registered(spark):
    delta_source.register(spark)
    return spark


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def test_batch_read_matches_library_reader(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "t")
    df = spark.range(50).select(
        "id", (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") * 1.5).alias("x"),
    )
    dw.create_delta(df, table, partition_by=["bucket"])
    got = spark.read.format("delta_native").load(table)
    # the table schema's own order is preserved (partition columns do
    # NOT migrate to the end as in Hive-style discovery)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "x"]
    assert {(r.id, r.bucket, r.x) for r in got.collect()} == {
        (i, i % 4, i * 1.5) for i in range(50)
    }


def test_batch_time_travel_option(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "tt")
    dw.create_delta(spark.range(3), table)
    dw.overwrite_delta(spark.range(10, 13), table)
    cur = spark.read.format("delta_native").load(table)
    assert _ids(cur) == {10, 11, 12}
    v0 = spark.read.format("delta_native").option("versionAsOf", 0).load(
        table
    )
    assert _ids(v0) == {0, 1, 2}


def test_batch_read_after_rename_column_mapping(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "rn")
    dw.create_delta(
        spark.range(4).select("id", (F.col("id") * 2).alias("x")), table
    )
    dw.rename_column(spark, table, "x", "doubled")
    got = spark.read.format("delta_native").load(table)
    assert got.columns == ["id", "doubled"]
    assert {r.doubled for r in got.collect()} == {0, 2, 4, 6}


def test_push_filters_prunes_partition_files(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "pf")
    df = spark.range(40).select(
        "id", (F.col("id") % 4).cast("int").alias("b")
    )
    dw.create_delta(df, table, partition_by=["b"])
    # unit-level: the reader's pushFilters must shrink its file list
    from pyspark.sql.datasource import EqualTo

    r = delta_source._BatchReader(table, None)
    n_all = len(r.partitions())
    rest = list(r.pushFilters([EqualTo(("b",), 2)]))
    assert len(rest) == 1  # returned for Spark to re-apply (harmless)
    n_pruned = len(r.partitions())
    assert 0 < n_pruned < n_all
    # end to end the filtered read is correct
    got = spark.read.format("delta_native").load(table).where("b = 2")
    assert _ids(got) == {i for i in range(40) if i % 4 == 2}


def test_stream_reads_appends_and_skips_compaction(
    registered, tmp_path
):
    spark = registered
    table = str(tmp_path / "st")
    ck = str(tmp_path / "ck")
    dw.create_delta(spark.range(5).coalesce(1), table)
    dw.append_delta(spark.range(5, 10).coalesce(1), table)

    def drain():
        batches: set = set()

        def sink(batch_df, _bid):
            batches.update(r.id for r in batch_df.select("id").collect())

        q = (
            spark.readStream.format("delta_native")
            .load(table)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.exception():
            raise q.exception()
        return batches

    assert drain() == set(range(10))
    # compaction between micro-batches: dataChange=false — invisible
    dw.compact_delta(spark, table, target_files=1)
    dw.append_delta(spark.range(10, 13).coalesce(1), table)
    assert drain() == {10, 11, 12}  # only the new rows, no re-emits
    # a data-removing commit breaks the append-only contract loudly
    from dst_spark_k8_lakehouse_spark.plans import delta_dml

    delta_dml.delete_delta(spark, table, "id = 11")
    dw.append_delta(spark.range(13, 14).coalesce(1), table)
    with pytest.raises(Exception, match="append-only|removed data"):
        drain()


def test_batch_write_append_and_overwrite(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "w")
    dw.create_delta(spark.range(3), table)
    spark.range(3, 6).write.format("delta_native").mode("append").save(
        table
    )
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr

    assert _ids(dr.read_delta(spark, table)) == set(range(6))
    spark.range(50, 53).write.format("delta_native").mode(
        "overwrite"
    ).save(table)
    assert _ids(dr.read_delta(spark, table)) == {50, 51, 52}
    # prior versions still travel (overwrite is a logical remove)
    assert _ids(dr.read_delta(spark, table, version=1)) == set(range(6))


def test_batch_write_partitioned_keeps_single_scan_layout(
    registered, tmp_path
):
    spark = registered
    table = str(tmp_path / "wp")
    df = spark.range(0, 0).select(
        "id", (F.col("id") % 3).cast("int").alias("b")
    )
    dw.create_delta(df, table, partition_by=["b"])
    spark.range(30).select(
        "id", (F.col("id") % 3).cast("int").alias("b")
    ).write.format("delta_native").mode("append").save(table)
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr

    state = dr._replay(spark, table, None)
    assert all(rel.startswith("b=") for rel in state["files"])
    cur = dr.read_delta(spark, table)
    assert {(r.id, r.b) for r in cur.collect()} == {
        (i, i % 3) for i in range(30)
    }
    plan = cur._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    pruned = dr.read_delta(spark, table, partition_filter={"b": 1})
    assert pruned.inputFiles() and all(
        "b=1" in f for f in pruned.inputFiles()
    )


def test_batch_write_schema_mismatch_refused(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "ws")
    dw.create_delta(spark.range(2), table)
    with pytest.raises(Exception, match="table"):
        spark.range(2).select(
            F.col("id").alias("renamed")
        ).write.format("delta_native").mode("append").save(table)


def test_stream_write_exactly_once(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "src")
    table = str(tmp_path / "wt")
    ck = str(tmp_path / "wck")
    for i in range(3):
        spark.range(i * 10, i * 10 + 4).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
    dw.create_delta(spark.createDataFrame([], "id long"), table)

    def run():
        q = (
            spark.readStream.schema("id long")
            .parquet(src + "/*")
            .writeStream.format("delta_native")
            .option("checkpointLocation", ck)
            .option("txnAppId", "wtest")
            .trigger(availableNow=True)
            .start(table)
        )
        q.awaitTermination(120)
        if q.exception():
            raise q.exception()

    run()
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr

    expected = {i * 10 + j for i in range(3) for j in range(4)}
    assert _ids(dr.read_delta(spark, table)) == expected
    # restart over the same checkpoint: no duplicates
    run()
    assert _ids(dr.read_delta(spark, table)) == expected
    # the txn watermark is in the log (exactly-once evidence, not
    # just checkpoint dedup)
    state = dr._replay(spark, table, None)
    assert state["txns"].get("wtest", -1) >= 0
    # new file → only the new rows land
    spark.range(100, 102).coalesce(1).write.parquet(f"{src}/f9")
    run()
    assert _ids(dr.read_delta(spark, table)) == expected | {100, 101}


def test_stream_raises_on_cleaned_log_range(registered, tmp_path):
    """A stream whose offset range was checkpoint-cleaned must FAIL,
    never silently skip the vanished versions' rows."""
    import os

    spark = registered
    table = str(tmp_path / "cl")
    dw.create_delta(spark.range(3).coalesce(1), table)
    dw.append_delta(spark.range(3, 6).coalesce(1), table)
    dw.write_checkpoint(spark, table)
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr

    for _v, f in dr._commit_files(table):
        os.unlink(f)
    r = delta_source._StreamReader(table)
    with pytest.raises(ValueError, match="no longer in the log"):
        r.partitions({"version": -1}, r.latestOffset())
    # a stream that starts AT the checkpoint is fine (empty range)
    assert r.partitions(r.latestOffset(), r.latestOffset()) == []


def test_batch_read_schema_evolved_table(registered, tmp_path):
    """Files written before a mergeSchema append / ADD COLUMN read the
    new columns as typed nulls through the format — previously this
    crashed the pyarrow scan on the missing column."""
    spark = registered
    table = str(tmp_path / "ev")
    dw.create_delta(spark.range(3), table)
    dw.append_delta(
        spark.range(3, 5).select("id", F.lit("x").alias("tag")),
        table, merge_schema=True,
    )
    dw.add_column(spark, table, "note", "string")
    got = {
        (r.id, r.tag, r.note)
        for r in spark.read.format("delta_native").load(table).collect()
    }
    assert got == {(0, None, None), (1, None, None), (2, None, None),
                   (3, "x", None), (4, "x", None)}
