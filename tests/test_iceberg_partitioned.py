"""Identity-partitioned native Iceberg tables: partition records in
the manifests, driver-side pruning, partitioned appends and
copy-on-write DML that re-derives partition records on rewrite
(reference anchor: partitioned lakehouse tables,
``02_iceberg_demo.ipynb:45-54``)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import iceberg_dml as idml
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 3).cast("int").alias("bucket"),
        (F.col("id") * 2).alias("x"),
    )


def test_partitioned_create_metadata_and_read(spark, tmp_path):
    table = str(tmp_path / "ipt")
    iw.create_iceberg(_df(spark, 0, 30), table, partition_by=["bucket"])
    meta, _ = iw._load_meta(table)
    spec = meta["partition-specs"][0]["fields"]
    assert [
        (f["name"], f["transform"], f["field-id"]) for f in spec
    ] == [("bucket", "identity", 1000)]
    cur = ir.read_iceberg(spark, table)
    # identity partition values are IN the data files — full fidelity
    assert {(r.id, r.bucket, r.x) for r in cur.collect()} == {
        (i, i % 3, i * 2) for i in range(30)
    }


def test_partition_filter_prunes_manifest_entries(spark, tmp_path):
    table = str(tmp_path / "ipp")
    iw.create_iceberg(_df(spark, 0, 30), table, partition_by=["bucket"])
    iw.append_iceberg(_df(spark, 30, 60), table)
    pruned = ir.read_iceberg(spark, table, partition_filter={"bucket": 1})
    assert _ids(pruned) == {i for i in range(60) if i % 3 == 1}
    full = ir.read_iceberg(spark, table)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    pred = ir.read_iceberg(
        spark, table, partition_filter=lambda pv: pv["bucket"] in (0, 2)
    )
    assert _ids(pred) == {i for i in range(60) if i % 3 != 1}
    with pytest.raises(ValueError, match="not a partition field"):
        ir.read_iceberg(spark, table, partition_filter={"x": 1})
    unpart = str(tmp_path / "u")
    iw.create_iceberg(spark.range(3), unpart)
    with pytest.raises(ValueError, match="unpartitioned"):
        ir.read_iceberg(spark, unpart, partition_filter={"bucket": 0})


def test_partitioned_dml_rederives_partition_records(spark, tmp_path):
    table = str(tmp_path / "ipd")
    s1 = iw.create_iceberg(_df(spark, 0, 30), table, partition_by=["bucket"])
    # whole-partition delete: bucket-2 files drop, others carry
    idml.delete_iceberg(spark, table, "bucket = 2")
    assert _ids(ir.read_iceberg(spark, table)) == {
        i for i in range(30) if i % 3 != 2
    }
    # partial update inside one partition — rewritten file must land
    # back in a manifest entry with the RIGHT partition record, so a
    # pruned read still sees the updated rows
    idml.update_iceberg(spark, table, "id = 4", {"x": "999"})
    pruned = ir.read_iceberg(spark, table, partition_filter={"bucket": 1})
    got = {(r.id, r.x) for r in pruned.collect()}
    assert (4, 999) in got
    assert got == {(i, 999 if i == 4 else i * 2)
                   for i in range(30) if i % 3 == 1}
    # update that MOVES a row across partitions: allowed — identity
    # values live in the rows and records are re-derived on rewrite
    idml.update_iceberg(spark, table, "id = 7", {"bucket": "0"})
    assert 7 in _ids(
        ir.read_iceberg(spark, table, partition_filter={"bucket": 0})
    )
    assert 7 not in _ids(
        ir.read_iceberg(spark, table, partition_filter={"bucket": 1})
    )
    # pre-DML snapshot unchanged
    assert _ids(ir.read_iceberg(spark, table, snapshot_id=s1)) == set(
        range(30)
    )


def test_date_partition_values_typed(spark, tmp_path):
    table = str(tmp_path / "ipdate")
    df = spark.range(0, 6).select(
        "id",
        F.expr("date_add(DATE'2024-01-01', CAST(id % 2 AS INT))").alias("d"),
    )
    iw.create_iceberg(df, table, partition_by=["d"])
    import datetime

    days = (datetime.date(2024, 1, 2) - datetime.date(1970, 1, 1)).days
    pruned = ir.read_iceberg(
        spark, table, partition_filter=lambda pv: pv["d"] == days
    )
    assert _ids(pruned) == {1, 3, 5}


def test_unsupported_partition_transform_raises(spark, tmp_path):
    table = str(tmp_path / "ipx")
    with pytest.raises(ValueError, match="partition column"):
        iw.create_iceberg(spark.range(3), table, partition_by=["nope"])
    # identity on a float type: the partition record cannot carry it
    with pytest.raises(NotImplementedError, match="double"):
        iw.create_iceberg(
            spark.range(3).select(
                "id", F.lit(1.5).alias("f")
            ).withColumn("f", F.col("f").cast("double")),
            str(tmp_path / "ipy"),
            partition_by=["f"],
        )
