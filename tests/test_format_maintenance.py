"""Maintenance on native-format tables: Delta VACUUM (unreferenced
data-file GC) and Iceberg EXPIRE SNAPSHOTS (metadata prune + orphan
file GC) — the reference demos both (``03_delta_demo.ipynb:182-186``
VACUUM RETAIN; snapshot expiry is the Iceberg runtime's
counterpart)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _ids(df):
    return {r.id for r in df.select("id").collect()}


def test_delta_vacuum_removes_tombstoned_files(spark, tmp_path):
    table = str(tmp_path / "vac")
    dw.create_delta(spark.range(5), table)
    dw.overwrite_delta(spark.range(10, 15), table)  # v0 files tombstoned
    listed = dw.vacuum_delta(spark, table, dry_run=True)
    assert listed  # the v0 files are unreferenced by the latest version
    # dry run deleted nothing: v0 still time-travels
    assert _ids(dr.read_delta(spark, table, version=0)) == set(range(5))
    removed = dw.vacuum_delta(spark, table)
    assert removed == listed
    assert _ids(dr.read_delta(spark, table)) == set(range(10, 15))
    # the expired version's data is gone — reading it now fails
    with pytest.raises(Exception):
        dr.read_delta(spark, table, version=0).collect()


def test_delta_vacuum_retain_versions_keeps_time_travel(spark, tmp_path):
    table = str(tmp_path / "vac2")
    dw.create_delta(spark.range(3), table)
    dw.overwrite_delta(spark.range(3, 6), table)
    dw.overwrite_delta(spark.range(6, 9), table)
    dw.vacuum_delta(spark, table, retain_versions=2)
    # last two versions still read; the first is gone
    assert _ids(dr.read_delta(spark, table, version=1)) == {3, 4, 5}
    assert _ids(dr.read_delta(spark, table, version=2)) == {6, 7, 8}
    with pytest.raises(Exception):
        dr.read_delta(spark, table, version=0).collect()
    with pytest.raises(ValueError, match=">= 1"):
        dw.vacuum_delta(spark, table, retain_versions=0)


def test_delta_vacuum_reclaims_abandoned_commit_garbage(spark, tmp_path):
    table = str(tmp_path / "vac3")
    dw.create_delta(spark.range(3), table)
    # simulate an abandoned commit attempt: data files written, commit
    # never published
    dw._write_data_files(spark.range(100, 105), table)
    orphans = dw.vacuum_delta(spark, table, dry_run=True)
    assert len(orphans) >= 1
    dw.vacuum_delta(spark, table)
    assert _ids(dr.read_delta(spark, table)) == {0, 1, 2}
    assert dw.vacuum_delta(spark, table, dry_run=True) == []


def test_iceberg_expire_snapshots(spark, tmp_path):
    table = str(tmp_path / "exp")
    s1 = iw.create_iceberg(spark.range(4), table)
    s2 = iw.append_iceberg(spark.range(4, 8), table)
    s3 = iw.overwrite_iceberg(spark.range(20, 24), table)
    listed = iw.expire_snapshots(spark, table, retain_last=1, dry_run=True)
    assert listed
    # dry run: all three snapshots still readable
    assert _ids(ir.read_iceberg(spark, table, snapshot_id=s1)) == {0, 1, 2, 3}
    removed = iw.expire_snapshots(spark, table, retain_last=1)
    assert removed == listed
    assert all(not os.path.exists(p) for p in removed)
    # current snapshot intact, expired ones rejected by snapshot lookup
    assert _ids(ir.read_iceberg(spark, table)) == {20, 21, 22, 23}
    snaps = ir.iceberg_snapshots(table)
    assert [s["snapshot_id"] for s in snaps] == [s3]
    with pytest.raises(ValueError, match="not in table"):
        ir.read_iceberg(spark, table, snapshot_id=s2)
    # second expiry is a no-op
    assert iw.expire_snapshots(spark, table, retain_last=1) == []


def test_iceberg_expire_keeps_shared_files(spark, tmp_path):
    """An append snapshot shares the create snapshot's files; expiring
    the create snapshot must NOT delete files the retained append
    still references."""
    table = str(tmp_path / "exp2")
    iw.create_iceberg(spark.range(4), table)
    iw.append_iceberg(spark.range(4, 8), table)
    iw.expire_snapshots(spark, table, retain_last=1)
    assert _ids(ir.read_iceberg(spark, table)) == set(range(8))


def test_delta_compact_bin_packs_small_files(spark, tmp_path):
    table = str(tmp_path / "opt")
    dw.create_delta(spark.range(0, 0), table)
    for i in range(6):  # six tiny single-file appends (streaming shape)
        dw.append_delta(spark.range(i * 10, i * 10 + 10).coalesce(1), table)
    before = len(dr._replay(spark, table, None)["files"])
    assert before == 7  # 6 appends + the empty create's schema-only file
    v = dw.compact_delta(spark, table, target_files=2)
    assert v > 0
    state = dr._replay(spark, table, None)
    assert len(state["files"]) == 2
    # pure reorganization: the row set is untouched...
    assert _ids(dr.read_delta(spark, table)) == set(range(0, 60))
    # ...and the commit is dataChange=false per the spec
    import json
    import os

    last = dr._commit_files(table)[-1][1]
    with open(last) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    for a in actions:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    # pre-compaction versions still time travel
    assert _ids(dr.read_delta(spark, table, version=1)) == set(range(10))
    # idempotent: nothing left to compact at the target
    assert dw.compact_delta(spark, table, target_files=2) == -1


def test_delta_compact_partitioned_keeps_layout(spark, tmp_path):
    table = str(tmp_path / "optp")
    df = spark.range(40).select(
        "id", (F.col("id") % 2).cast("int").alias("p")
    )
    dw.create_delta(df.repartition(4), table, partition_by=["p"])
    dw.append_delta(df.withColumn("id", F.col("id") + 100), table)
    dw.compact_delta(spark, table, target_files=1)
    state = dr._replay(spark, table, None)
    assert len(state["files"]) == 2  # one file per partition
    assert all(rel.startswith("p=") for rel in state["files"])
    got = _ids(dr.read_delta(spark, table))
    assert got == set(range(40)) | {i + 100 for i in range(40)}
    # single-scan layout survives compaction
    plan = (
        dr.read_delta(spark, table)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Union" not in plan


def test_delta_timestamp_time_travel(spark, tmp_path):
    import json
    import os

    table = str(tmp_path / "tt")
    dw.create_delta(spark.range(3), table)
    dw.overwrite_delta(spark.range(10, 13), table)
    # pin distinct commit timestamps directly in the log
    for v, f in dr._commit_files(table):
        lines = []
        with open(f) as fh:
            for ln in fh:
                if ln.strip():
                    d = json.loads(ln)
                    if "commitInfo" in d:
                        d["commitInfo"]["timestamp"] = 1_000_000 + v * 1000
                    lines.append(json.dumps(d))
        os.unlink(f)
        with open(f, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    assert _ids(dr.read_delta(spark, table, timestamp=1_000_500)) == {0, 1, 2}
    assert _ids(dr.read_delta(spark, table, timestamp=1_001_000)) == {10, 11, 12}
    with pytest.raises(ValueError, match="no commit at or before"):
        dr.read_delta(spark, table, timestamp=999)
    with pytest.raises(ValueError, match="not both"):
        dr.read_delta(spark, table, version=0, timestamp=1_000_500)


def test_delta_maintenance_job_shrinks_streamed_table(spark, tmp_path):
    """The nightly triad over a streaming-shaped table: many one-file
    commits → checkpoint + compact + vacuum leaves few files, few
    reclaimable bytes, and a checkpoint the reader replays from —
    while the CURRENT data is untouched."""
    import sys

    sys.path.insert(0, "jobs")
    from delta_maintenance import run_maintenance, table_health

    table = str(tmp_path / "mt")
    dw.create_delta(spark.range(0, 0), table)
    for i in range(8):  # the per-micro-batch sink shape
        dw.append_delta(
            spark.range(i * 5, i * 5 + 5).coalesce(1), table,
            txn=("stream", i),
        )
    before = table_health(spark, table)
    assert before["n_files"] >= 8 and before["txn_apps"] == ["stream"]
    report = run_maintenance(spark, table, retain_versions=1,
                             target_files=2)
    after = report["after"]
    assert after["n_files"] <= 3  # bin-packed (+ the empty create file)
    assert after["checkpoint_version"] is not None
    assert report["n_vacuumed"] > 0  # pre-compaction files reclaimed
    assert _ids(dr.read_delta(spark, table)) == set(range(40))
    # the txn watermark survived the triad: a replayed batch still skips
    assert dw.append_delta(spark.range(99), table, txn=("stream", 7)) == -1
    # idempotent: an immediate second run has nothing to do
    report2 = run_maintenance(spark, table, retain_versions=1,
                              target_files=2)
    assert report2["compacted_version"] == -1
    assert report2["n_vacuumed"] == 0


def test_delta_maintenance_materializes_dvs_first(spark, tmp_path):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "jobs")
    )
    from delta_maintenance import run_maintenance, table_health

    from dst_spark_k8_lakehouse_spark.plans import delta_dv
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "dvmaint")
    dw.create_delta(spark.range(100).repartition(4), table)
    delta_dv.delete_where_dv(spark, table, "id % 10 = 0")
    assert table_health(spark, table)["vectored_files"] >= 1
    report = run_maintenance(
        spark, table, retain_versions=1, target_files=1
    )
    assert report["materialized_version"] >= 0
    assert report["after"]["vectored_files"] == 0
    got = {r.id for r in dr.read_delta(spark, table).collect()}
    assert got == {i for i in range(100) if i % 10}


def test_iceberg_maintenance_job_folds_and_expires(spark, tmp_path):
    """The Iceberg maintenance triad on a streamed-shaped table:
    MoR delete files folded, small files bin-packed, history expired
    — every decision from metadata-only stats; hidden-partitioned
    targets keep correct partition records through the rewrite."""
    import datetime
    import importlib
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs"),
    )
    im = importlib.import_module("iceberg_maintenance")

    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_mor,
        iceberg_reader,
        iceberg_writer,
    )

    table = str(tmp_path / "t")
    rows = [
        (i, datetime.datetime(2024, 4, 1 + i % 5, 6), float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz, x double")
    iceberg_writer.create_iceberg(
        df.limit(0), table, partition_by=["days(ts)"], format_version=2
    )
    # streamed shape: many tiny appends
    for k in range(4):
        iceberg_writer.append_iceberg(
            df.where(f"id % 4 = {k}"), table, txn=("m", k)
        )
    # plus merge-on-read deletes
    iceberg_mor.delete_where_mor(spark, table, "id % 10 = 0")
    before = im.table_health(spark, table)
    assert before["position_delete_files"] > 0
    report = im.run_maintenance(
        spark, table, retain_last=1, target_files=6
    )
    after = report["after"]
    assert after["position_delete_files"] == 0
    assert after["equality_delete_files"] == 0
    assert after["data_files"] <= before["data_files"]
    assert after["n_snapshots"] == 1
    assert report["n_expired_paths"] > 0
    got = iceberg_reader.read_iceberg(spark, table)
    assert got.count() == 180
    assert got.where("id % 10 = 0").count() == 0
    # pruning still correct after the rewrite (partition records
    # re-derived by the transform writer)
    lo = datetime.datetime(2024, 4, 2)
    hi = datetime.datetime(2024, 4, 4)
    pruned = iceberg_reader.read_iceberg(
        spark, table, predicates=[("ts", ">=", lo), ("ts", "<", hi)]
    )
    want = {i for i, t, _x in rows if lo <= t < hi and i % 10 != 0}
    assert {r.id for r in pruned.collect()} == want


def test_remove_orphan_files(spark, tmp_path):
    """Failed-commit leftovers (what a lost put-if-absent race leaves:
    unreferenced data parquet + manifest + manifest list) are swept by
    remove_orphan_files; referenced files and the metadata JSON chain
    are never touched; fresh files survive the older-than guard."""
    import os
    import time as _t

    from pyspark.sql import functions as F

    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_reader,
        iceberg_writer,
    )

    t = str(tmp_path / "t")
    df = spark.range(100).select("id", (F.col("id") % 5).alias("g"))
    iceberg_writer.create_iceberg(df, t)
    iceberg_writer.append_iceberg(df, t)
    # fabricate a lost-race leftover set
    orphan_data = os.path.join(t, "data", "orphan-loser.parquet")
    df.limit(5).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage")
    )
    part = next(
        f for f in os.listdir(tmp_path / "stage")
        if f.endswith(".parquet")
    )
    os.replace(str(tmp_path / "stage" / part), orphan_data)
    md = iceberg_reader._metadata_dir(t)
    orphan_manifest = os.path.join(md, "m-orphan.avro")
    orphan_mlist = os.path.join(md, "snap-999999.avro")
    fresh_orphan = os.path.join(t, "data", "orphan-fresh.parquet")
    for p in (orphan_manifest, orphan_mlist):
        with open(p, "wb") as fh:
            fh.write(b"Obj\x01fake")
    with open(fresh_orphan, "wb") as fh:
        fh.write(b"PAR1fake")
    old = _t.time() - 48 * 3600
    for p in (orphan_data, orphan_manifest, orphan_mlist):
        os.utime(p, (old, old))
    # dry run lists, deletes nothing
    listed = iceberg_writer.remove_orphan_files(spark, t, dry_run=True)
    assert {os.path.basename(p) for p in listed} == {
        "orphan-loser.parquet", "m-orphan.avro", "snap-999999.avro"
    }
    assert all(os.path.exists(p) for p in listed)
    deleted = iceberg_writer.remove_orphan_files(spark, t)
    assert sorted(deleted) == sorted(listed)
    assert not any(os.path.exists(p) for p in deleted)
    assert os.path.exists(fresh_orphan)  # under the 24 h guard
    # every referenced file intact: full read + time travel both work
    assert iceberg_reader.read_iceberg(spark, t).count() == 200
    meta, _v = iceberg_writer._load_meta(t)
    first = int(meta["snapshots"][0]["snapshot-id"])
    assert iceberg_reader.read_iceberg(
        spark, t, snapshot_id=first
    ).count() == 100
    # sweep with a future cutoff takes the fresh orphan too
    more = iceberg_writer.remove_orphan_files(
        spark, t, older_than_ms=int(_t.time() * 1000) + 10_000
    )
    assert [os.path.basename(p) for p in more] == ["orphan-fresh.parquet"]


def test_expire_metadata_versions(spark, tmp_path):
    """previous-versions-max: old v*.metadata.json are deleted and the
    metadata-log trimmed, while snapshots (and snapshot time travel)
    survive untouched."""
    import os

    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_reader,
        iceberg_writer,
    )

    t = str(tmp_path / "t")
    df = spark.range(20).select("id")
    iceberg_writer.create_iceberg(df, t)
    for _ in range(6):
        iceberg_writer.append_iceberg(df, t)
    md = iceberg_reader._metadata_dir(t)
    n_before = sum(
        1 for f in os.listdir(md) if f.endswith(".metadata.json")
    )
    assert n_before == 7
    listed = iceberg_writer.expire_metadata_versions(
        t, keep_last=3, dry_run=True
    )
    assert all(os.path.exists(p) for p in listed)
    deleted = iceberg_writer.expire_metadata_versions(t, keep_last=3)
    assert sorted(deleted) == sorted(listed) and deleted
    left = sorted(
        f for f in os.listdir(md) if f.endswith(".metadata.json")
    )
    assert len(left) == 3  # v6, v7 and the GC commit's v8
    # every snapshot still present and time-travelable
    meta, _v = iceberg_writer._load_meta(t)
    assert len(meta["snapshots"]) == 7
    first = int(meta["snapshots"][0]["snapshot-id"])
    assert iceberg_reader.read_iceberg(
        spark, t, snapshot_id=first
    ).count() == 20
    assert iceberg_reader.read_iceberg(spark, t).count() == 140
    # metadata-log only references surviving files
    for e in meta.get("metadata-log") or []:
        assert os.path.exists(str(e["metadata-file"]))
