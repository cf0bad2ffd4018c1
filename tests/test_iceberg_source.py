"""format("iceberg_native") — the Spark Python DataSource over native
Iceberg tables: batch reads with field-id column resolution (renames,
added columns), snapshot time travel, and partition pushdown
pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.sources import iceberg_source


@pytest.fixture(scope="module")
def registered(spark):
    iceberg_source.register(spark)
    return spark


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def test_batch_read_and_snapshot_travel(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "t")
    s1 = iw.create_iceberg(
        spark.range(6).select("id", (F.col("id") * 2).alias("x")), table
    )
    iw.append_iceberg(
        spark.range(6, 9).select("id", (F.col("id") * 2).alias("x")), table
    )
    cur = spark.read.format("iceberg_native").load(table)
    assert cur.columns == ["id", "x"]
    assert {(r.id, r.x) for r in cur.collect()} == {
        (i, i * 2) for i in range(9)
    }
    old = (
        spark.read.format("iceberg_native")
        .option("snapshotId", s1)
        .load(table)
    )
    assert _ids(old) == set(range(6))


def test_rename_and_added_columns_resolve_by_field_id(
    registered, tmp_path
):
    spark = registered
    table = str(tmp_path / "rn")
    iw.create_iceberg(
        spark.range(4).select("id", (F.col("id") * 3).alias("x")), table
    )
    iw.rename_column(table, "x", "tripled")
    iw.add_column(table, "note", "string")
    got = spark.read.format("iceberg_native").load(table)
    assert got.columns == ["id", "tripled", "note"]
    rows = {(r.id, r.tripled, r.note) for r in got.collect()}
    assert rows == {(i, i * 3, None) for i in range(4)}


def test_partition_pushdown_prunes_files(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "pp")
    iw.create_iceberg(
        spark.range(30).select(
            "id", (F.col("id") % 3).cast("int").alias("b")
        ),
        table,
        partition_by=["b"],
    )
    from pyspark.sql.datasource import EqualTo

    r = iceberg_source._IceReader(table, None)
    n_all = len(r.partitions())
    list(r.pushFilters([EqualTo(("b",), 1)]))
    assert 0 < len(r.partitions()) < n_all
    got = spark.read.format("iceberg_native").load(table).where("b = 1")
    assert _ids(got) == {i for i in range(30) if i % 3 == 1}


def test_read_after_copy_on_write_dml(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "dml")
    iw.create_iceberg(
        spark.range(20).select("id", F.lit(1.0).alias("w")), table
    )
    idml.delete_iceberg(spark, table, "id >= 15")
    idml.update_iceberg(spark, table, "id = 3", {"w": "9.0"})
    got = spark.read.format("iceberg_native").load(table)
    assert {(r.id, r.w) for r in got.collect()} == {
        (i, 9.0 if i == 3 else 1.0) for i in range(15)
    }


def test_stream_reads_appends_exactly_once(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "st")
    ck = str(tmp_path / "ck")
    iw.create_iceberg(spark.range(4).coalesce(1), table)
    iw.append_iceberg(spark.range(4, 8).coalesce(1), table)

    def drain():
        got: set = set()

        def sink(batch_df, _bid):
            got.update(r.id for r in batch_df.select("id").collect())

        q = (
            spark.readStream.format("iceberg_native")
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

    assert drain() == set(range(8))
    iw.append_iceberg(spark.range(8, 10).coalesce(1), table)
    assert drain() == {8, 9}  # only the new snapshot's rows
    # an overwrite snapshot breaks the append-only contract loudly
    iw.overwrite_iceberg(spark.range(50, 52).coalesce(1), table)
    with pytest.raises(Exception, match="append-only"):
        drain()


def test_stream_raises_on_expired_start(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "ex")
    iw.create_iceberg(spark.range(3).coalesce(1), table)
    iw.append_iceberg(spark.range(3, 6).coalesce(1), table)
    r = iceberg_source._IceStreamReader(table)
    # a resume offset pointing at a snapshot that no longer exists
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"snapshot_id": 12345}, r.latestOffset())
    # empty range at the current snapshot is fine
    assert r.partitions(r.latestOffset(), r.latestOffset()) == []


def test_batch_write_append_overwrite_partitioned(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "w")
    iw.create_iceberg(
        spark.range(0, 0).select(
            "id", (F.col("id") % 3).cast("int").alias("b")
        ),
        table,
        partition_by=["b"],
    )
    spark.range(12).select(
        "id", (F.col("id") % 3).cast("int").alias("b")
    ).write.format("iceberg_native").mode("append").save(table)
    from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir2

    cur = ir2.read_iceberg(spark, table)
    assert {(r.id, r.b) for r in cur.collect()} == {
        (i, i % 3) for i in range(12)
    }
    # the written files carry field ids and typed partition records —
    # a manifest-pruned read sees exactly the partition's rows
    pruned = ir2.read_iceberg(spark, table, partition_filter={"b": 2})
    assert _ids(pruned) == {2, 5, 8, 11}
    # second append through the format carries the first forward
    spark.range(12, 15).select(
        "id", (F.col("id") % 3).cast("int").alias("b")
    ).write.format("iceberg_native").mode("append").save(table)
    assert _ids(ir2.read_iceberg(spark, table)) == set(range(15))
    # overwrite replaces; earlier snapshots stay readable
    snaps = ir2.iceberg_snapshots(table)
    pre = snaps[0]["snapshot_id"]
    spark.range(50, 52).select(
        "id", (F.col("id") % 3).cast("int").alias("b")
    ).write.format("iceberg_native").mode("overwrite").save(table)
    assert _ids(ir2.read_iceberg(spark, table)) == {50, 51}
    assert _ids(ir2.read_iceberg(spark, table, snapshot_id=pre)) == set(
        range(15)
    )
    # and the format's own reader agrees
    assert _ids(spark.read.format("iceberg_native").load(table)) == {50, 51}


def test_batch_write_schema_mismatch_refused(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "ws")
    iw.create_iceberg(spark.range(2), table)
    with pytest.raises(Exception, match="table"):
        spark.range(2).select(
            F.col("id").alias("nope")
        ).write.format("iceberg_native").mode("append").save(table)


def test_batch_read_applies_position_deletes(registered, tmp_path):
    """A v2 merge-on-read table reads correctly through the
    DataSource: each file's deleted positions resolve at planning and
    mask rows executor-side."""
    spark = registered
    from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
    from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw

    t = str(tmp_path / "mor")
    iw.create_iceberg(
        spark.range(40).repartition(3), t, format_version=2
    )
    iceberg_mor.delete_where_mor(spark, t, "id % 4 = 0")
    iceberg_mor.delete_where_mor(spark, t, "id = 1")
    got = {
        r.id
        for r in spark.read.format("iceberg_native").load(t).collect()
    }
    assert got == {i for i in range(40) if i % 4 and i != 1}


def test_batch_read_applies_equality_deletes(registered, tmp_path):
    """Equality deletes apply through the DataSource too — including
    the sequence rule: a key re-inserted AFTER the delete survives."""
    spark = registered
    from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
    from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw

    t = str(tmp_path / "eq")
    iw.create_iceberg(spark.range(10), t, format_version=2)
    iceberg_mor.delete_keys_mor(
        spark, t, spark.createDataFrame([(3,), (7,)], "id long")
    )
    iw.append_iceberg(spark.range(7, 8), t)  # re-insert: newer seq
    got = {
        r.id
        for r in spark.read.format("iceberg_native").load(t).collect()
    }
    assert got == set(range(10)) - {3}


def test_transform_pushdown_prunes_files(registered, tmp_path):
    """r7 hidden-partition pushdown: a range filter on the SOURCE
    column of a days(ts) spec prunes the file list through the
    transform — the jar's behavior, no user-facing API at all."""
    import datetime

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    spark = registered
    table = str(tmp_path / "tp")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 10, 8 + i % 12))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    iw.create_iceberg(df, table, partition_by=["days(ts)"])
    r = iceberg_source._IceReader(table, None)
    n_all = len(r.partitions())
    assert n_all >= 10  # one file per day at least
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 6)  # exclusive; days 3,4,5
    list(r.pushFilters([
        GreaterThanOrEqual(("ts",), lo), LessThan(("ts",), hi),
    ]))
    kept_days = {e["pv"]["ts_day"] for e in r.entries}
    d0 = (datetime.date(2024, 1, 3) - datetime.date(1970, 1, 1)).days
    assert kept_days == {d0, d0 + 1, d0 + 2}
    # end-to-end through the DataFrame API (Spark pushes the filter)
    got = (
        spark.read.format("iceberg_native").load(table)
        .where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    )
    want = {i for i, t in rows if lo <= t < hi}
    assert _ids(got) == want
    # bucket spec: equality on the source prunes to one bucket
    table2 = str(tmp_path / "tb")
    iw.create_iceberg(
        spark.range(100).select("id"), table2,
        partition_by=["bucket(8, id)"],
    )
    r2 = iceberg_source._IceReader(table2, None)
    list(r2.pushFilters([EqualTo(("id",), 7)]))
    from dst_spark_k8_lakehouse_spark.plans import iceberg_transforms

    want_b = iceberg_transforms.bucket_value(7, 8, "long")
    assert {e["pv"]["id_bucket"] for e in r2.entries} == {want_b}
    got2 = spark.read.format("iceberg_native").load(table2).where(
        "id = 7"
    )
    assert _ids(got2) == {7}


def test_datasource_write_transformed_spec(registered, tmp_path):
    """r7: format('iceberg_native') writes group and record partition
    values THROUGH the spec's transform — a days(ts) append from the
    DataFrame API lands one file per day with typed day records."""
    import datetime

    spark = registered
    table = str(tmp_path / "dw")
    rows = [
        (i, datetime.datetime(2024, 2, 1 + i % 4, 9)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    iw.create_iceberg(df.limit(0), table, partition_by=["days(ts)"])
    # one task → per-PARTITION file counts are observable (each task
    # writes its own partition files, like any distributed writer)
    df.coalesce(1).write.format("iceberg_native").mode("append").save(
        table
    )
    got = spark.read.format("iceberg_native").load(table)
    assert _ids(got) == set(range(40))
    # manifests carry day ints; pruning through the source works
    meta, _ = iw._load_meta(table)
    snaps = {int(s["snapshot-id"]): s for s in meta["snapshots"]}
    from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir2

    data, _p, _e = ir2._snapshot_entries(
        None, snaps[int(meta["current-snapshot-id"])],
        iw._spec_fields(meta),
    )
    d0 = (datetime.date(2024, 2, 1) - datetime.date(1970, 1, 1)).days
    assert {e["pv"]["ts_day"] for e in data} == {d0, d0 + 1, d0 + 2,
                                                 d0 + 3}
    assert len(data) == 4  # one file per day, not per distinct ts
    lo = datetime.datetime(2024, 2, 2)
    hi = datetime.datetime(2024, 2, 3)
    pruned = ir2.read_iceberg(
        spark, table, predicates=[("ts", ">=", lo), ("ts", "<", hi)]
    )
    assert {r.id for r in pruned.collect()} == {
        i for i, t in rows if lo <= t < hi
    }
    assert len(pruned.inputFiles()) == 1
