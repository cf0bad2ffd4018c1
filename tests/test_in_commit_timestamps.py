"""Delta IN-COMMIT TIMESTAMPS (spec ``inCommitTimestamp`` writer
feature): once enabled, every commit's commitInfo LEADS the action
list and carries a strictly monotonic timestamp, and ``TIMESTAMP AS
OF`` resolves against commit content — not commitInfo wall clocks or
file mtimes, both of which lie after storage migrations / clock skew.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import dml


def _mk(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    dw.create_delta(
        spark.range(3).select(F.col("id").alias("k")).coalesce(1),
        table,
    )
    return table


def _commit_lines(table, version):
    f = os.path.join(table, "_delta_log", f"{version:020d}.json")
    with open(f) as fh:
        return [json.loads(x) for x in fh if x.strip()]


def _ict(table, version):
    lines = _commit_lines(table, version)
    assert "commitInfo" in lines[0], (
        "ICT commits must lead with commitInfo"
    )
    return lines[0]["commitInfo"]["inCommitTimestamp"]


def test_enable_records_feature_and_boundary(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v = dw.enable_in_commit_timestamps(spark, table)
    assert v == 1
    state = dr._replay(spark, table, None)
    conf = state["metaData"]["configuration"]
    assert conf[dw.ICT_CONF] == "true"
    assert conf[dw.ICT_VERSION_CONF] == "1"
    assert int(conf[dw.ICT_TS_CONF]) > 0
    p = state["protocol"]
    assert p["minWriterVersion"] == 7
    assert "inCommitTimestamp" in p["writerFeatures"]
    # idempotent
    assert dw.enable_in_commit_timestamps(spark, table) == 1
    # the enabling commit itself carries an ICT, first
    assert _ict(table, 1) > 0


def test_commits_monotonic_even_under_clock_skew(
    spark, tmp_path, monkeypatch
):
    table = _mk(spark, tmp_path)
    dw.enable_in_commit_timestamps(spark, table)
    dw.append_delta(
        spark.createDataFrame([(10,)], "k long"), table
    )
    t1 = _ict(table, 2)
    # freeze the clock BEFORE the previous commit's ICT — the stamp
    # must still move strictly forward
    frozen = (t1 - 60_000) / 1000.0
    monkeypatch.setattr(time, "time", lambda: frozen)
    dw.append_delta(
        spark.createDataFrame([(11,)], "k long"), table
    )
    t2 = _ict(table, 3)
    assert t2 == t1 + 1  # max(clock, prev+1) with a stale clock


def test_state_dependent_commits_carry_ict(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.enable_in_commit_timestamps(spark, table)
    delta_dml.delete_delta(spark, table, "k = 0")
    assert _ict(table, 2) >= _ict(table, 1)
    dw.write_checkpoint(spark, table)
    # checkpoint is not a commit; next commit still chains correctly
    delta_dml.update_delta(spark, table, "k = 1", {"k": "100"})
    assert _ict(table, 3) > _ict(table, 2) - 1


def test_timestamp_travel_ignores_mtime_rewrites(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.enable_in_commit_timestamps(spark, table)
    dw.append_delta(
        spark.createDataFrame([(10,)], "k long"), table
    )
    dw.append_delta(
        spark.createDataFrame([(11,)], "k long"), table
    )
    t2 = _ict(table, 2)
    # a storage migration rewrites every mtime to NOW — ICT tables
    # must not care
    now = time.time()
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        os.utime(os.path.join(log, f), (now, now))
    v = dr.version_at_timestamp(table, t2)
    assert v == 2
    rows = {
        r.k for r in dr.read_delta(spark, table, timestamp=t2).collect()
    }
    assert rows == {0, 1, 2, 10}
    # between t2 and t3 resolves to v2 as well
    t3 = _ict(table, 3)
    if t3 - t2 > 1:
        assert dr.version_at_timestamp(table, t3 - 1) == 2
    assert dr.version_at_timestamp(table, t3) == 3


def test_pre_enable_history_keeps_legacy_resolution(spark, tmp_path):
    table = _mk(spark, tmp_path)  # v0: legacy stamp
    dw.append_delta(
        spark.createDataFrame([(10,)], "k long"), table
    )  # v1 legacy
    dw.enable_in_commit_timestamps(spark, table)  # v2 ICT
    lines0 = _commit_lines(table, 0)
    legacy_ts = next(
        d["commitInfo"]["timestamp"] for d in lines0 if "commitInfo" in d
    )
    assert dr.version_at_timestamp(table, legacy_ts) >= 0


def test_statement_face(spark, tmp_path):
    table = _mk(spark, tmp_path)
    tables = {"t": table}
    v = dml.execute_native_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES "
        "(delta.enableInCommitTimestamps = true)",
        tables,
    )
    assert v == 1
    conf = dr._replay(spark, table, None)["metaData"]["configuration"]
    assert conf[dw.ICT_CONF] == "true"
