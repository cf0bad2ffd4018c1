"""Generic table properties + AUTO-CHECKPOINTING: SET TBLPROPERTIES
on both formats, guarded feature-property refusals, and
``delta.checkpointInterval`` writing checkpoints as commits land —
bounded log replay without an operator remembering maintenance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import dml
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _mk(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    dw.create_delta(
        spark.range(3).select(F.col("id").alias("k")).coalesce(1),
        table,
    )
    return table


def test_set_table_properties_delta(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dml.execute_native_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ("
        "'owner' = 'data-eng', delta.checkpointInterval = '4')",
        {"t": table},
    )
    conf = dr._replay(spark, table, None)["metaData"]["configuration"]
    assert conf["owner"] == "data-eng"
    assert conf["delta.checkpointInterval"] == "4"
    # guarded feature properties refuse the generic route
    with pytest.raises(ValueError, match="protocol work"):
        dw.set_table_properties(
            spark, table, {"delta.enableChangeDataFeed": "true"}
        )


def test_set_properties_iceberg(spark, tmp_path):
    table = str(tmp_path / "i")
    iw.create_iceberg(
        spark.range(3).select(F.col("id").alias("k")).coalesce(1),
        table,
    )
    dml.execute_native_sql(
        spark,
        "ALTER TABLE i SET TBLPROPERTIES ("
        "'write.metadata.previous-versions-max' = '7')",
        {"i": table},
    )
    meta, _ = iw._load_meta(table)
    assert meta["properties"][
        "write.metadata.previous-versions-max"
    ] == "7"


def test_auto_checkpoint_interval(spark, tmp_path):
    table = _mk(spark, tmp_path)  # v0
    dw.set_table_properties(
        spark, table, {dw.CHECKPOINT_INTERVAL_CONF: "2"}
    )  # v1
    assert dr._checkpoint(table) is None
    dw.append_delta(
        spark.createDataFrame([(10,)], "k long"), table
    )  # v2 -> auto checkpoint
    cp = dr._checkpoint(table)
    assert cp is not None and cp[0] == 2
    dw.append_delta(
        spark.createDataFrame([(11,)], "k long"), table
    )  # v3: no new checkpoint
    assert dr._checkpoint(table)[0] == 2
    from dst_spark_k8_lakehouse_spark.plans import delta_dml

    delta_dml.delete_delta(spark, table, "k = 0")  # v4 -> checkpoint
    assert dr._checkpoint(table)[0] == 4
    # state reads fine from the auto checkpoint
    rows = {r.k for r in dr.read_delta(spark, table).collect()}
    assert rows == {1, 2, 10, 11}


def test_auto_checkpoint_off_by_default(spark, tmp_path):
    table = _mk(spark, tmp_path)
    for i in range(3):
        dw.append_delta(
            spark.createDataFrame([(100 + i,)], "k long"), table
        )
    assert dr._checkpoint(table) is None


def test_describe_and_show_faces(spark, tmp_path):
    d = _mk(spark, tmp_path, name="dd")
    dw.set_table_properties(spark, d, {"owner": "data-eng"})
    dw.append_delta(
        spark.createDataFrame([(9,)], "k long").coalesce(1), d
    )
    i = str(tmp_path / "di")
    iw.create_iceberg(
        spark.range(4).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        ).coalesce(1),
        i,
        partition_by=["grp"],
    )
    iw.set_properties(i, {"commit.retry.num-retries": "3"})
    tables = {"d": d, "i": i}

    det = dml.query_native_sql(spark, "DESCRIBE DETAIL d", tables).head()
    assert det.format == "delta" and det.numFiles == 2
    assert det.properties["owner"] == "data-eng"
    det_i = dml.query_native_sql(
        spark, "DESCRIBE DETAIL i", tables
    ).head()
    assert det_i.format == "iceberg"
    assert det_i.partitionColumns == ["grp"]

    hist = dml.query_native_sql(
        spark, "DESCRIBE HISTORY d", tables
    ).collect()
    assert [r.version for r in hist] == [2, 1, 0]
    assert hist[0].operation == "WRITE"
    hist_i = dml.query_native_sql(
        spark, "DESCRIBE HISTORY i", tables
    ).collect()
    assert len(hist_i) == 1 and hist_i[0].operation == "append"

    props = {
        r.key: r.value
        for r in dml.query_native_sql(
            spark, "SHOW TBLPROPERTIES i", tables
        ).collect()
    }
    assert props == {"commit.retry.num-retries": "3"}


def test_describe_history_prefers_ict(spark, tmp_path):
    import os
    import time as _t

    d = _mk(spark, tmp_path, name="hict")
    dw.enable_in_commit_timestamps(spark, d)
    dw.append_delta(spark.createDataFrame([(5,)], "k long"), d)
    hist = dml.query_native_sql(
        spark, "DESCRIBE HISTORY d", {"d": d}
    ).collect()
    ict_v2 = next(r.timestamp_ms for r in hist if r.version == 2)
    # rewrite mtimes: the history's v2 stamp must not move (ICT)
    now = _t.time()
    log = os.path.join(d, "_delta_log")
    for f in os.listdir(log):
        os.utime(os.path.join(log, f), (now, now))
    hist2 = dml.query_native_sql(
        spark, "DESCRIBE HISTORY d", {"d": d}
    ).collect()
    assert next(
        r.timestamp_ms for r in hist2 if r.version == 2
    ) == ict_v2


def test_log_retention_cleanup(spark, tmp_path):
    """delta.logRetentionDuration: commits below the checkpoint and
    past the window are deleted (with their crc sidecars); reads and
    in-window travel stay exact; travel below the boundary raises the
    reconstruction error instead of silently partial state."""
    import os
    import time as _t

    table = _mk(spark, tmp_path, name="lr")                  # v0
    dw.set_table_properties(
        spark, table, {dw.LOG_RETENTION_CONF: "interval 1 days"}
    )                                                        # v1
    for i in range(3):                                       # v2-v4
        dw.append_delta(
            spark.createDataFrame([(10 + i,)], "k long").coalesce(1),
            table,
        )
    dw.write_checkpoint(spark, table)                        # cp @ v4
    # nothing cleaned yet: everything is younger than 1 day
    assert [v for v, _ in dr._commit_files(table)] == list(range(5))
    # age v0-v2 artificially past the window, keep v3+ fresh
    old = _t.time() - 2 * 24 * 3600
    log = os.path.join(table, "_delta_log")
    for v in (0, 1, 2):
        os.utime(os.path.join(log, f"{v:020d}.json"), (old, old))
    removed = dw.clean_expired_log(table)
    assert {os.path.basename(p) for p in removed if p.endswith(".json")} \
        == {f"{v:020d}.json" for v in (0, 1, 2)}
    assert [v for v, _ in dr._commit_files(table)] == [3, 4]
    # current reads replay from the checkpoint, exact
    assert {r.k for r in dr.read_delta(spark, table).collect()} \
        == {0, 1, 2, 10, 11, 12}
    # travel into the cleaned region raises loudly
    with pytest.raises(ValueError, match="no longer reconstructable"):
        dr.read_delta(spark, table, version=1)
    # in-window travel (>= checkpoint) still works
    assert len(dr.read_delta(spark, table, version=4).collect()) == 6


def test_log_cleanup_declines_without_checkpoint_or_prop(spark, tmp_path):
    table = _mk(spark, tmp_path, name="lr2")
    # no property -> no cleanup even with a checkpoint
    dw.write_checkpoint(spark, table)
    assert dw.clean_expired_log(table) == []
    # property but no checkpoint -> decline (the checkpoint is the
    # replay baseline)
    t2 = _mk(spark, tmp_path, name="lr3")
    dw.set_table_properties(
        spark, t2, {dw.LOG_RETENTION_CONF: "0"}
    )
    assert dw.clean_expired_log(t2) == []
