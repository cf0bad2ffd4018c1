"""Exactly-once streaming appends onto native Delta logs via the
spec's SetTransaction action: retried micro-batches skip, racing
duplicate writers can't double-commit, watermarks survive
checkpoints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.streaming.delta_sink import stream_to_delta


def _ids(spark, table):
    return {r.id for r in dr.read_delta(spark, table).select("id").collect()}


def test_txn_append_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(spark.range(0, 0), table)
    v1 = dw.append_delta(spark.range(5), table, txn=("app", 0))
    assert v1 == 1
    # a retry of the same batch is a no-op
    assert dw.append_delta(spark.range(5), table, txn=("app", 0)) == -1
    assert _ids(spark, table) == set(range(5))
    # the next batch lands; an OLDER batch id also skips
    assert dw.append_delta(spark.range(5, 8), table, txn=("app", 1)) > 0
    assert dw.append_delta(spark.range(99), table, txn=("app", 0)) == -1
    # a different app is independent
    assert dw.append_delta(spark.range(8, 9), table, txn=("other", 0)) > 0
    assert _ids(spark, table) == set(range(9))


def test_txn_watermark_survives_checkpoint(spark, tmp_path):
    table = str(tmp_path / "cp")
    dw.create_delta(spark.range(3), table)
    dw.append_delta(spark.range(3, 5), table, txn=("app", 7))
    dw.write_checkpoint(spark, table)
    # remove the pre-checkpoint JSON commits: replay now starts at the
    # checkpoint, which must still carry the txn watermark
    import os

    for v, f in dr._commit_files(table):
        os.unlink(f)
    assert dw.append_delta(spark.range(99), table, txn=("app", 7)) == -1
    assert dw.append_delta(spark.range(5, 6), table, txn=("app", 8)) > 0
    assert _ids(spark, table) == set(range(6))


def test_racing_duplicate_txn_writers_single_commit(
    spark, tmp_path, monkeypatch
):
    """Two writers carrying the SAME (app, batch) race: one lands, the
    other's retry loop re-reads the log, sees the watermark, skips."""
    table = str(tmp_path / "race")
    dw.create_delta(spark.range(2), table)
    orig = dw._commit
    raced = {"done": False}

    def racy(tbl, version, actions, **kw):
        if not raced["done"]:
            raced["done"] = True
            adds = dw._write_data_files(spark.range(10, 13), tbl)
            orig(
                tbl,
                version,
                adds
                + [{"txn": {"appId": "app", "version": 4}}]
                + [dw._commit_info("WRITE")],
            )
        return orig(tbl, version, actions, **kw)

    monkeypatch.setattr(dw, "_commit", racy)
    v = dw.append_delta(spark.range(10, 13), table, txn=("app", 4))
    monkeypatch.setattr(dw, "_commit", orig)
    assert v == -1  # the competitor's identical batch won; no duplicate
    assert _ids(spark, table) == {0, 1, 10, 11, 12}


def test_stream_to_delta_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "tab")
    ckpt = str(tmp_path / "ck")
    for i in range(4):  # 4 files → multiple micro-batches available
        spark.range(i * 10, i * 10 + 5).withColumn(
            "batch", F.lit(i)
        ).coalesce(1).write.parquet(f"{src}/f{i}")
    schema = "id long, batch int"
    dw.create_delta(spark.createDataFrame([], schema), table)
    with pytest.raises(ValueError, match="create_delta"):
        stream_to_delta(
            spark.readStream.schema(schema).parquet(src + "/*"),
            str(tmp_path / "nope"), ckpt,
        )
    q = stream_to_delta(
        spark.readStream.schema(schema).parquet(src + "/*"), table, ckpt
    )
    q.awaitTermination(120)
    expected = {i * 10 + j for i in range(4) for j in range(5)}
    assert _ids(spark, table) == expected
    # restart over the same checkpoint: nothing new, nothing duplicated
    q2 = stream_to_delta(
        spark.readStream.schema(schema).parquet(src + "/*"), table, ckpt
    )
    q2.awaitTermination(120)
    assert _ids(spark, table) == expected
    # new data arrives → exactly the new rows land
    spark.range(100, 103).withColumn("batch", F.lit(9)).coalesce(1) \
        .write.parquet(f"{src}/f9")
    q3 = stream_to_delta(
        spark.readStream.schema(schema).parquet(src + "/*"), table, ckpt
    )
    q3.awaitTermination(120)
    assert _ids(spark, table) == expected | {100, 101, 102}
