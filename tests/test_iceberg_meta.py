"""Iceberg metadata tables (.files/.partitions/.manifests/.history/
.refs) and the incremental append scan — all driver-side manifest
walks surfaced as DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_meta as im
from dst_spark_k8_lakehouse_spark.plans import iceberg_mor
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("g")
    )


def test_files_and_manifests_tables(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_df(spark, 0, 10).coalesce(1), t)
    iw.append_iceberg(_df(spark, 10, 15).coalesce(1), t)
    files = im.files_table(spark, t).collect()
    assert len(files) == 2
    assert sum(r.record_count for r in files) == 15
    assert all(r.content_kind == "data" for r in files)
    mans = im.manifests_table(spark, t).collect()
    assert len(mans) == 2
    assert all(r.content == 0 for r in mans)


def test_files_table_shows_delete_files(spark, tmp_path):
    t = str(tmp_path / "mor")
    iw.create_iceberg(_df(spark, 0, 10).coalesce(1), t,
                      format_version=2)
    iceberg_mor.delete_where_mor(spark, t, "id < 3")
    kinds = {
        r.content_kind: r.record_count
        for r in im.files_table(spark, t).collect()
    }
    assert kinds == {"data": 10, "position_deletes": 3}


def test_partitions_table_counts(spark, tmp_path):
    t = str(tmp_path / "pt")
    iw.create_iceberg(_df(spark, 0, 30), t, partition_by=["g"])
    rows = {
        (r.g, r.record_count)
        for r in im.partitions_table(spark, t).collect()
    }
    assert rows == {("0", 10), ("1", 10), ("2", 10)}
    files = im.partitions_table(spark, t).agg(
        F.sum("file_count")
    ).collect()[0][0]
    assert files >= 3


def test_history_and_refs_tables(spark, tmp_path):
    t = str(tmp_path / "h")
    s1 = iw.create_iceberg(_df(spark, 0, 3), t)
    s2 = iw.append_iceberg(_df(spark, 3, 5), t)
    iw.create_tag(t, "v1", snapshot_id=s1)
    hist = im.history_table(spark, t).orderBy("made_current_at_ms")
    got = [(r.snapshot_id, r.is_current) for r in hist.collect()]
    assert got == [(s1, False), (s2, True)]
    refs = im.refs_table(spark, t).collect()
    assert [(r.name, r.type, r.snapshot_id) for r in refs] \
        == [("v1", "tag", s1)]


def test_incremental_append_scan(spark, tmp_path):
    t = str(tmp_path / "inc")
    s1 = iw.create_iceberg(_df(spark, 0, 5), t)
    s2 = iw.append_iceberg(_df(spark, 5, 8), t)
    s3 = iw.append_iceberg(_df(spark, 8, 12), t)
    inc = im.read_iceberg_incremental(spark, t, s1, s3)
    assert {r.id for r in inc.collect()} == set(range(5, 12))
    only2 = im.read_iceberg_incremental(spark, t, s1, s2)
    assert {r.id for r in only2.collect()} == {5, 6, 7}
    # default to_snapshot = current
    assert {
        r.id for r in im.read_iceberg_incremental(spark, t, s2).collect()
    } == set(range(8, 12))


def test_incremental_refuses_non_append_range(spark, tmp_path):
    t = str(tmp_path / "inc2")
    s1 = iw.create_iceberg(_df(spark, 0, 5), t)
    iw.overwrite_iceberg(_df(spark, 100, 103), t)
    with pytest.raises(ValueError, match="append-only"):
        im.read_iceberg_incremental(spark, t, s1).collect()
    with pytest.raises(ValueError, match="not in table"):
        im.read_iceberg_incremental(spark, t, 12345)


class TestChangelog:
    """read_iceberg_changelog: per-snapshot row-level changes with
    carryover cancellation; position AND equality deletes
    materialized; expired ranges refuse."""

    def _mk(self, spark, tmp_path, v2=True):
        from dst_spark_k8_lakehouse_spark.plans import iceberg_writer

        table = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"s{i % 3}", float(i)) for i in range(60)],
            "id long, s string, x double",
        )
        iceberg_writer.create_iceberg(
            df.repartition(3), table,
            format_version=2 if v2 else 1,
        )
        return table, df

    def test_append_only_changelog(self, spark, tmp_path):
        from dst_spark_k8_lakehouse_spark.plans import (
            iceberg_meta as im,
            iceberg_writer as iw,
        )

        table, df = self._mk(spark, tmp_path)
        iw.append_iceberg(
            df.withColumn("id", F.col("id") + 100), table
        )
        log = im.read_iceberg_changelog(spark, table)
        got = log.groupBy("_snapshot_ordinal", "_change_type").count()
        rows = {(r[0], r[1]): r[2] for r in got.collect()}
        assert rows == {(1, "insert"): 60, (2, "insert"): 60}

    def test_cow_delete_net_changes(self, spark, tmp_path):
        from dst_spark_k8_lakehouse_spark.plans import (
            iceberg_dml,
            iceberg_meta as im,
        )

        table, df = self._mk(spark, tmp_path)
        iceberg_dml.delete_iceberg(spark, table, "id % 4 = 0")
        log = im.read_iceberg_changelog(spark, table)
        d2 = log.where("_snapshot_ordinal = 2")
        # net: only the deleted rows appear (carried rows cancelled)
        assert d2.where("_change_type = 'insert'").count() == 0
        assert {r.id for r in d2.collect()} == {
            i for i in range(60) if i % 4 == 0
        }

    def test_position_delete_changelog(self, spark, tmp_path):
        from dst_spark_k8_lakehouse_spark.plans import (
            iceberg_meta as im,
            iceberg_mor,
        )

        table, df = self._mk(spark, tmp_path)
        iceberg_mor.delete_where_mor(spark, table, "id < 5")
        log = im.read_iceberg_changelog(spark, table)
        d2 = log.where("_snapshot_ordinal = 2")
        assert {(r.id, r._change_type) for r in d2.collect()} == {
            (i, "delete") for i in range(5)
        }

    def test_range_selection(self, spark, tmp_path):
        from dst_spark_k8_lakehouse_spark.plans import (
            iceberg_meta as im,
            iceberg_writer as iw,
        )

        table, df = self._mk(spark, tmp_path)
        snaps0 = iw._load_meta(table)[0]["snapshots"]
        first = int(snaps0[0]["snapshot-id"])
        iw.append_iceberg(df.withColumn("id", F.col("id") + 100), table)
        log = im.read_iceberg_changelog(
            spark, table, from_snapshot=first
        )
        assert log.select("_snapshot_ordinal").distinct().collect() == [
            __import__("pyspark").sql.Row(_snapshot_ordinal=2)
        ]
        assert log.count() == 60

    def test_post_expire_and_missing_file_behavior(self, spark, tmp_path):
        """expire keeps files the remaining snapshots' bookkeeping
        entries reference, so the surviving history's changelog still
        reconstructs; a GENUINELY missing referenced file raises."""
        import os

        from dst_spark_k8_lakehouse_spark.plans import (
            iceberg_dml,
            iceberg_meta as im,
            iceberg_writer as iw,
        )

        table, df = self._mk(spark, tmp_path)
        iceberg_dml.delete_iceberg(spark, table, "id % 2 = 0")
        iw.expire_snapshots(spark, table, retain_last=1)
        log = im.read_iceberg_changelog(spark, table)
        # the one remaining snapshot is ordinal 1 now; its net change
        # is still exactly the deleted-rows set
        assert {r.id for r in log.where(
            "_change_type = 'delete'"
        ).collect()} == {i for i in range(60) if i % 2 == 0}
        # physically remove one referenced file → loud refusal
        meta, _ = iw._load_meta(table)
        snap = meta["snapshots"][-1]
        from dst_spark_k8_lakehouse_spark.plans import iceberg_reader

        for mf in iceberg_reader._avro_records(
            spark, snap["manifest-list"]
        ):
            for e in iceberg_reader._avro_records(
                spark,
                iceberg_reader._strip_uri(str(mf["manifest_path"])),
            ):
                p = iceberg_reader._strip_uri(
                    str(e["data_file"]["file_path"])
                )
                os.unlink(p)
                break
            break
        with pytest.raises(ValueError, match="expired file"):
            im.read_iceberg_changelog(spark, table).collect()


def test_manifests_table_partition_summaries(spark, tmp_path):
    """r8: ``tbl.manifests`` exposes decoded partition_summaries —
    one per spec field, bounds in the pv domain rendered as strings
    (real Iceberg's column of the same name)."""
    import datetime

    t = str(tmp_path / "t")
    df = spark.range(60).coalesce(1).select(
        "id",
        (F.to_timestamp(F.lit("2024-03-01 00:00:00")) +
         F.make_interval(days=(F.col("id") % 3).cast("int"))).alias("ts"),
    )
    iw.create_iceberg(df, t, partition_by=["days(ts)"])
    rows = im.manifests_table(spark, t).collect()
    assert len(rows) == 1
    s = rows[0].partition_summaries
    assert s is not None and len(s) == 1
    d0 = (datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)).days
    assert s[0].field == "ts_day"
    assert s[0].contains_null is False
    assert s[0].lower_bound == str(d0)
    assert s[0].upper_bound == str(d0 + 2)
