"""CHANGE DATA FEED (CDF) on native Delta tables — jar-free CDC per
the public protocol's ``cdc`` action and ``_change_data/`` layout.

What it is: with ``delta.enableChangeDataFeed=true``, every row-level
DML commit also records the CHANGED ROWS — ``insert`` /
``update_preimage`` / ``update_postimage`` / ``delete`` — so
downstream consumers (sync jobs, incremental aggregates, audit) read
*what changed between versions* instead of diffing snapshots. This is
the table-format face of CDC; the reference stack ships it inside the
Delta 4.0 jars (``scripts/download-jars.sh:80-83``).

Write side: ``plans/delta_dml`` passes each operation's change rows
here; ``write_cdc_files`` lands them under ``_change_data/`` with a
``_change_type`` column and the commit carries ``cdc`` actions
(``dataChange: false`` — CDC files are invisible to normal reads,
which replay only add/remove). Cost: proportional to CHANGED rows.

Read side (``read_change_feed(table, starting_version[,
ending_version])``) stamps ``_commit_version`` / ``_commit_timestamp``
per commit and resolves each version by precedence:

1. commits WITH ``cdc`` actions → read exactly those files (the
   written truth; add/remove of the same commit are ignored per spec);
2. pure appends (dataChange adds, no removes) → every row ``insert``;
3. pure removals (dataChange removes, no adds) → the removed files'
   rows as ``delete`` (they must still exist on disk — VACUUM bounds
   how far back CDF reaches, like real Delta);
4. deletion-vector deletes (same path removed+re-added with a grown
   DV) → the NEWLY deleted positions, ``delete``d rows recovered from
   the data file by row index — no cdc file needed;
5. anything else that changed data without cdc (pre-CDF rewrites) →
   raise loudly: the change set is not reconstructible.

Layout note, stated honestly: cdc files here carry the FULL row
(partition columns included) with ``partitionValues: {}`` on the
action — self-consistent and what ``read_change_feed`` expects;
real-runtime CDF readers of PARTITIONED tables expect Hive-laid-out
cdc files, so cross-engine CDF conformance is claimed for
unpartitioned tables only. Column mapping: ``name`` mode handled;
``id`` mode raises.

Scale: CDF reads touch only the commits in the requested range and
only changed rows' files; the write side adds one changed-rows-sized
parquet per DML commit. Both are bounded by churn, not table size.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.plans import delta_reader, delta_writer

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"
COMMIT_TS = "_commit_timestamp"
_CDC_DIR = "_change_data"


def cdf_enabled(meta: dict[str, Any]) -> bool:
    conf = meta.get("configuration") or {}
    return str(conf.get("delta.enableChangeDataFeed", "false")).lower() \
        == "true"


def enable_cdf(spark: SparkSession, table: str) -> int:
    """``ALTER TABLE ... SET TBLPROPERTIES
    (delta.enableChangeDataFeed=true)`` — one metaData commit. Only
    DML from this point on records change rows (the spec's behavior:
    CDF is not retroactive)."""
    state = delta_reader._replay(spark, table, None)
    meta = dict(state["metaData"])
    conf = dict(meta.get("configuration") or {})
    if str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true":
        return delta_writer._next_version(table) - 1
    conf["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = conf
    # metaData commit from replayed state: serializable (r8) — a
    # racing schema change must surface, not be silently clobbered
    return delta_writer._commit_from_state(
        spark, table, state,
        [
            {"metaData": meta},
            delta_writer._commit_info("SET TBLPROPERTIES"),
        ],
        "SET TBLPROPERTIES",
    )


def write_cdc_files(
    df: DataFrame, table: str
) -> list[dict[str, Any]]:
    """Write change rows (``df`` must carry ``_change_type``) under
    ``_change_data/``; return their ``cdc`` actions."""
    import shutil
    import time

    staging = os.path.join(table, f"_staging-cdc-{uuid.uuid4().hex}")
    df.write.parquet(staging)
    cdc_dir = os.path.join(table, _CDC_DIR)
    os.makedirs(cdc_dir, exist_ok=True)
    actions = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"cdc-{uuid.uuid4().hex}.snappy.parquet"
        dst = os.path.join(cdc_dir, name)
        os.replace(os.path.join(staging, f), dst)
        actions.append(
            {
                "cdc": {
                    "path": f"{_CDC_DIR}/{name}",
                    "partitionValues": {},
                    "size": os.path.getsize(dst),
                    "dataChange": False,
                }
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    return actions


def _commit_actions(path: str) -> list[dict[str, Any]]:
    with open(path) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _inject_pv(
    df: DataFrame,
    pv: dict[str, str | None],
    schema: T.StructType,
) -> DataFrame:
    by_name = {f.name: f for f in schema.fields}
    for c, raw in pv.items():
        dt = by_name[c].dataType
        df = df.withColumn(
            c,
            F.lit(None).cast(dt) if raw is None else F.lit(raw).cast(dt),
        )
    return df


def change_units(
    table: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> list[dict[str, Any]]:
    """THE CHANGE PLANNER — pure Python, no SparkSession: walk the
    commit log and emit one unit per change source in the requested
    range. Shared by the batch ``read_change_feed`` and the
    ``delta_native`` CDF stream reader (whose ``partitions()`` runs
    in DataSource planning where no session exists).

    Unit: ``{"version", "ts", "kind": "cdc"|"insert"|"delete",
    "path" (as stored in the log), "pv" (the file's partitionValues —
    resolved from its ADD action even for bare removes, which don't
    carry them), "positions" (explicit row indexes, None = all)}``.

    Per-version precedence (the module docstring's rules 1-5): cdc
    actions win; else pure adds = inserts; pure removes = deletes
    (minus rows an earlier DV already reported); DV-grown re-adds =
    the bitmap diff; other rewrites raise."""
    from dst_spark_k8_lakehouse_spark.plans import delta_dv

    commits = dict(delta_reader._commit_files(table))
    if ending_version is None:
        ending_version = max(commits) if commits else -1
    prev_dv: dict[str, dict] = {}   # path -> DV descriptor so far
    live_pv: dict[str, dict] = {}   # path -> partitionValues of its add
    units: list[dict[str, Any]] = []
    for v in sorted(commits):
        f = commits[v]
        actions = _commit_actions(f)
        in_range = starting_version <= v <= ending_version
        ts = None
        for a in actions:
            if "commitInfo" in a:
                ts = a["commitInfo"].get("timestamp")
        if ts is None:
            ts = int(os.path.getmtime(f) * 1000)
        cdcs = [a["cdc"] for a in actions if "cdc" in a]
        adds = [
            a["add"] for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"] for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        if in_range:
            if cdcs:
                units += [
                    {"version": v, "ts": ts, "kind": "cdc",
                     "path": c["path"], "pv": {}, "positions": None}
                    for c in cdcs
                ]
            elif adds and not removes:
                units += [
                    {"version": v, "ts": ts, "kind": "insert",
                     "path": a["path"],
                     "pv": a.get("partitionValues") or {},
                     "positions": None}
                    for a in adds
                ]
            elif removes and not adds:
                for r in removes:
                    old = prev_dv.get(r["path"])
                    positions = None
                    if old:
                        # rows the old DV had already deleted were
                        # reported in THEIR commit, not this one
                        kept = set(delta_dv.dv_positions(table, old))
                        positions = sorted(
                            set(range(_row_count(table, r["path"])))
                            - kept
                        )
                    units.append(
                        {"version": v, "ts": ts, "kind": "delete",
                         "path": r["path"],
                         "pv": r.get("partitionValues")
                         or live_pv.get(r["path"]) or {},
                         "positions": positions}
                    )
            elif adds and removes:
                re_added = {a["path"]: a for a in adds}
                ok = len(adds) == len(removes) and all(
                    re_added.get(r["path"], {}).get("deletionVector")
                    for r in removes
                )
                if not ok:
                    raise ValueError(
                        f"version {v} of {table} rewrote data without "
                        "cdc actions (pre-CDF DML?) — its change set "
                        "is not reconstructible; enable CDF before "
                        "mutating"
                    )
                for r in removes:
                    a = re_added[r["path"]]
                    new_pos = set(
                        delta_dv.dv_positions(table, a["deletionVector"])
                    )
                    old = prev_dv.get(r["path"])
                    old_pos = (
                        set(delta_dv.dv_positions(table, old))
                        if old else set()
                    )
                    fresh = sorted(new_pos - old_pos)
                    if fresh:
                        units.append(
                            {"version": v, "ts": ts, "kind": "delete",
                             "path": a["path"],
                             "pv": a.get("partitionValues") or {},
                             "positions": fresh}
                        )
        # track DV + partition state across ALL versions, also outside
        # the range, so an in-range unit sees the true prior state
        for a0 in actions:
            if "add" in a0:
                ad = a0["add"]
                live_pv[ad["path"]] = ad.get("partitionValues") or {}
                if ad.get("deletionVector"):
                    prev_dv[ad["path"]] = ad["deletionVector"]
                else:
                    prev_dv.pop(ad["path"], None)
    return units


def _file_rows(
    spark: SparkSession,
    table: str,
    action: dict[str, Any],
    schema: T.StructType,
    part_cols: list[str],
    phys: dict[str, str],
    positions: list[int] | None = None,
) -> DataFrame:
    """One add/remove action's rows under the LOGICAL schema,
    optionally restricted to explicit row ``positions`` (the
    DV-delete reconstruction)."""
    rel = action["path"]
    absp = rel if os.path.isabs(rel) else os.path.join(table, rel)
    if not os.path.exists(absp):
        raise ValueError(
            f"change-feed source file {rel} no longer exists (vacuumed)"
            " — CDF reaches only as far back as retention"
        )
    data_fields = [
        T.StructField(phys.get(f.name, f.name), f.dataType, f.nullable)
        for f in schema.fields
        if f.name not in part_cols
    ]
    df = spark.read.schema(T.StructType(data_fields)).parquet(absp)
    if positions is not None:
        from dst_spark_k8_lakehouse_spark.localrel import local_frame

        df = df.withColumn("__cdf_pos", F.col("_metadata.row_index"))
        # local_frame: a broadcast LocalRelation builds driver-side
        # with no job; createDataFrame(list) would plan an RDD scan
        # whose broadcast runs a Python-worker job per read (r13)
        pos_df = F.broadcast(
            local_frame(
                spark, [(int(p),) for p in positions], "__cdf_pos long"
            )
        )
        df = df.join(pos_df, "__cdf_pos").drop("__cdf_pos")
    pv_raw = action.get("partitionValues") or {}
    df = _inject_pv(
        df,
        {c: pv_raw.get(phys.get(c, c)) for c in part_cols},
        schema,
    )
    return df.select(
        *[
            F.col(phys.get(f.name, f.name)).alias(f.name)
            if f.name not in part_cols
            else F.col(f.name)
            for f in schema.fields
        ]
    )


def read_change_feed(
    spark: SparkSession,
    table: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """The change rows of every commit in
    ``[starting_version, ending_version]`` with ``_change_type``,
    ``_commit_version`` and ``_commit_timestamp`` columns — the
    native-log equivalent of
    ``spark.read.option("readChangeFeed", "true")``."""
    from dst_spark_k8_lakehouse_spark.plans import delta_dv

    state = delta_reader._replay(spark, table, None)
    meta = state["metaData"]
    mode, phys = delta_reader._mapping(meta)
    if mode == "id":
        raise NotImplementedError(
            "change feed over id-mode column mapping is not supported"
        )
    schema = delta_reader.schema_from_json(meta["schemaString"])
    part_cols = delta_reader._partition_cols(meta, schema, phys)
    pieces: list[DataFrame] = []

    def _stamp(df: DataFrame, kind: str | None, v: int, ts: int):
        if kind is not None:
            df = df.withColumn(CHANGE_TYPE, F.lit(kind))
        return df.withColumn(COMMIT_VERSION, F.lit(v).cast("long")) \
            .withColumn(
                COMMIT_TS,
                (F.lit(ts) / 1000).cast("timestamp"),
            )

    for u in change_units(table, starting_version, ending_version):
        if u["kind"] == "cdc":
            cdc_path = os.path.join(table, *u["path"].split("/"))
            cdf_schema = T.StructType(
                [
                    T.StructField(
                        phys.get(fl.name, fl.name),
                        fl.dataType,
                        fl.nullable,
                    )
                    for fl in schema.fields
                ]
                + [T.StructField(CHANGE_TYPE, T.StringType(), False)]
            )
            df = spark.read.schema(cdf_schema).parquet(cdc_path)
            df = df.select(
                *[
                    F.col(phys.get(fl.name, fl.name)).alias(fl.name)
                    for fl in schema.fields
                ],
                CHANGE_TYPE,
            )
            pieces.append(_stamp(df, None, u["version"], u["ts"]))
        else:
            pieces.append(
                _stamp(
                    _file_rows(
                        spark, table,
                        {"path": u["path"], "partitionValues": u["pv"]},
                        schema, part_cols, phys,
                        positions=u["positions"],
                    ),
                    u["kind"], u["version"], u["ts"],
                )
            )
    if not pieces:
        empty = T.StructType(
            list(schema.fields)
            + [
                T.StructField(CHANGE_TYPE, T.StringType(), False),
                T.StructField(COMMIT_VERSION, T.LongType(), False),
                T.StructField(COMMIT_TS, T.TimestampType(), False),
            ]
        )
        return spark.createDataFrame([], empty)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _row_count(table: str, rel: str) -> int:
    import pyarrow.parquet as pq

    absp = rel if os.path.isabs(rel) else os.path.join(table, rel)
    return pq.ParquetFile(absp).metadata.num_rows
