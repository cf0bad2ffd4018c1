"""V2 (sidecar) Delta checkpoints — writer + both read paths.

Spec surface (delta.io PROTOCOL.md "V2 Checkpoint Table Feature"):
UUID-named top-level file carrying checkpointMetadata / protocol /
metaData / txn / sidecar actions; file actions sharded into parquet
sidecars under ``_delta_log/_sidecars/``; the ``v2Checkpoint``
reader+writer feature declared on the table BEFORE the first v2
checkpoint exists. The scale claim under test: planning state is
reachable from the top-level file + sidecars alone (JSON commits at
or below the checkpoint can be cleaned up), and the columnar loader
produces byte-identical plans to the exact dict path.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dml as dml
from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from tests.test_delta_columnar import (
    _FILTER_POOL,
    _PRED_POOL,
    _both_paths,
    _norm,
    build_random_log,
)


def _mk(spark, tmp_path, name="t", parts=4, n=20, partition_by=None):
    table = str(tmp_path / name)
    df = (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id"),
            (F.col("id") % 5).alias("grp"),
            (F.col("id") * 10).cast("double").alias("val"),
        )
    )
    dw.create_delta(df, table, partition_by=partition_by)
    return table


def _sidecar_dir(table):
    return os.path.join(table, "_delta_log", "_sidecars")


def _top_file(table, v):
    log = os.path.join(table, "_delta_log")
    tops = [
        f
        for f in os.listdir(log)
        if f.startswith(f"{v:020d}.checkpoint.") and f.endswith(".parquet")
        and not f.endswith(".checkpoint.parquet")
    ]
    assert len(tops) == 1, tops
    return os.path.join(log, tops[0])


def test_v2_layout_and_supersedes_json(spark, tmp_path):
    table = _mk(spark, tmp_path, n=24)
    dml.update_delta(spark, table, "id = 0", {"val": "111.0"})
    dml.delete_delta(spark, table, "id = 23")
    v = dw.write_checkpoint_v2(spark, table, sidecar_files=3)
    # the protocol upgrade is itself a commit, so v = 2 DML + 1 upgrade
    assert v == 3
    _top_file(table, v)
    assert len(os.listdir(_sidecar_dir(table))) == 3
    expect = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    got = {r.id: r.val for r in dr.read_delta(spark, table).collect()}
    assert got == expect
    assert got[0] == 111.0 and 23 not in got
    # writes continue past the checkpoint at the right version
    nv = dw.append_delta(
        spark.createDataFrame(
            [(50, 3, 5.0)], "id long, grp long, val double"
        ),
        table,
    )
    assert nv == v + 1
    assert dr.read_delta(spark, table).count() == len(expect) + 1


def test_v2_protocol_upgrade_once(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v1 = dw.write_checkpoint_v2(spark, table)
    state = dr._replay(spark, table, None)
    p = state["protocol"]
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "v2Checkpoint" in p["readerFeatures"]
    assert "v2Checkpoint" in p["writerFeatures"]
    # second call: feature already declared — no new commit happens
    v2 = dw.write_checkpoint_v2(spark, table)
    assert v2 == v1


def test_v2_columnar_vs_dict_equality_randomized(spark, tmp_path):
    for seed in range(4):
        table = build_random_log(str(tmp_path), seed)
        dw.write_checkpoint_v2(spark, table, sidecar_files=2)
        rng = random.Random(4000 + seed)
        for _ in range(5):
            kw = {
                "predicates": rng.choice(_PRED_POOL),
                "partition_filter": rng.choice(_FILTER_POOL),
            }
            fast, slow = _both_paths(spark, table, **kw)
            assert _norm(fast) == _norm(slow), kw


def test_v2_matches_classic_checkpoint_state(spark, tmp_path):
    table = build_random_log(str(tmp_path), 77)
    cv = dw.write_checkpoint(spark, table)
    classic = dr.plan_file_list(spark, table)["files"]
    log = os.path.join(table, "_delta_log")
    os.unlink(os.path.join(log, f"{cv:020d}.checkpoint.parquet"))
    os.unlink(os.path.join(log, "_last_checkpoint"))
    dw.write_checkpoint_v2(spark, table, sidecar_files=3)
    v2 = dr.plan_file_list(spark, table)["files"]
    assert _norm(classic) == _norm(v2)


def test_v2_partition_pruning_through_checkpoint(spark, tmp_path):
    table = str(tmp_path / "p")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("ds")
    )
    dw.create_delta(df, table, partition_by=["ds"])
    v = dw.write_checkpoint_v2(spark, table, sidecar_files=2)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    full = dr.plan_file_list(spark, table)["files"]
    pruned = dr.plan_file_list(
        spark, table, partition_filter={"ds": "2"}
    )["files"]
    assert 0 < len(pruned) < len(full)
    assert all(a["partitionValues"]["ds"] == "2" for a in pruned.values())
    got = sorted(
        r.id
        for r in dr.read_delta(
            spark, table, partition_filter={"ds": "2"}
        ).collect()
    )
    assert got == [i for i in range(40) if i % 4 == 2]


def test_v2_dv_and_stats_survive(spark, tmp_path):
    table = _mk(spark, tmp_path, n=30)
    delta_dv.delete_where_dv(spark, table, "id >= 25")
    v = dw.write_checkpoint_v2(spark, table, sidecar_files=2)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    got = sorted(r.id for r in dr.read_delta(spark, table).collect())
    assert got == list(range(25))
    # per-add stats strings survive into the sidecars → data skipping
    # still works with the JSON history gone
    pruned = dr.plan_file_list(
        spark, table, predicates=[("id", "<", 2)]
    )["files"]
    full = dr.plan_file_list(spark, table)["files"]
    assert len(pruned) < len(full)


def test_v2_txn_watermarks_survive(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw._commit(
        table,
        1,
        [
            {"txn": {"appId": "streamA", "version": 7}},
            dw._commit_info("TXN"),
        ],
    )
    v = dw.write_checkpoint_v2(spark, table)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    state = dr._replay(spark, table, None)
    assert state["txns"]["streamA"] == 7


def test_v2_time_travel_before_checkpoint(spark, tmp_path):
    table = _mk(spark, tmp_path, n=10)
    dw.append_delta(
        spark.createDataFrame(
            [(100, 0, 1.0)], "id long, grp long, val double"
        ),
        table,
    )
    dw.write_checkpoint_v2(spark, table)
    # history kept → version 0 must bypass the (later) checkpoint
    assert dr.read_delta(spark, table, version=0).count() == 10


def test_v2_under_column_mapping(spark, tmp_path):
    table = _mk(spark, tmp_path, n=12)
    dw.rename_column(spark, table, "val", "score")
    v = dw.write_checkpoint_v2(spark, table, sidecar_files=2)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    df = dr.read_delta(spark, table)
    assert "score" in df.columns and df.count() == 12
    state = dr._replay(spark, table, None)
    assert "columnMapping" in state["protocol"]["readerFeatures"]


def test_v2_stale_last_checkpoint_hint_falls_back(spark, tmp_path):
    # a _last_checkpoint pointing at a version with NO checkpoint file
    # on disk must not break replay (foreign writers can leave hints)
    table = _mk(spark, tmp_path, n=8)
    lc = os.path.join(table, "_delta_log", "_last_checkpoint")
    with open(lc, "w") as fh:
        json.dump({"version": 0, "size": 1}, fh)
    assert dr.read_delta(spark, table).count() == 8


def test_v2_sidecar_shard_sizing(spark, tmp_path):
    table = build_random_log(str(tmp_path), 5)
    state = dr._replay(spark, table, None)
    n_adds = len(state["files"])
    assert n_adds > 4
    dw.write_checkpoint_v2(spark, table, adds_per_sidecar=2)
    want = -(-n_adds // 2)
    assert len(os.listdir(_sidecar_dir(table))) == want
