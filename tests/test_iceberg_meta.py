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
