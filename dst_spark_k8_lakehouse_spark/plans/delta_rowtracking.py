"""Delta ROW TRACKING — stable row identifiers (the spec's
``rowTracking`` writer feature).

Model (PROTOCOL.md "Row Tracking"): every add action on a row-tracked
table carries ``baseRowId`` (a fresh, non-overlapping id range — row i
of the file has FRESH row id ``baseRowId + i``) and
``defaultRowCommitVersion``; the allocation high-water mark rides the
``delta.rowTracking`` domain metadata so concurrent writers can't
hand out overlapping ranges (our commits are serialized by the
put-if-absent log, and the range is assigned inside each writer's
retry loop against the replayed watermark). When a REWRITE moves rows
between files (OPTIMIZE), fresh ids would change — so the rewrite
MATERIALIZES each row's id into the table's row-id column first
(name recorded in ``delta.rowTracking.materializedRowIdColumnName``),
and readers resolve ``coalesce(materialized, baseRowId + position)``.

Deviation, stated: the materialized column is a REGULAR nullable
column in the schemaString (hidden by ``read_delta`` unless row ids
are requested) rather than a parquet-only hidden column — same
physical layout, simpler schema plumbing; real Delta readers would
see one extra nullable column.

Scope (v1, the training-data-lake usage pattern): appends allocate,
DV deletes keep ids stable BY CONSTRUCTION (no file is rewritten),
OPTIMIZE preserves via materialization. Copy-on-write DML and
ZORDER/clustering REFUSE on row-tracked tables (they would reassign
ids silently) — delete via ``delta_dv.delete_where_dv``.

WHY at 100 TB: stable row ids are what make incremental downstream
work (feature backfills, embedding refresh, audit trails) keyed to a
ROW instead of a (file, position) that every compaction invalidates.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROW_TRACKING_DOMAIN = "delta.rowTracking"
MAT_COL_KEY = "delta.rowTracking.materializedRowIdColumnName"
ROW_ID = "_row_id"


def enabled(state: dict[str, Any]) -> bool:
    return ROW_TRACKING_DOMAIN in (state.get("domains") or {})


def high_water_mark(state: dict[str, Any]) -> int:
    conf = state["domains"][ROW_TRACKING_DOMAIN]
    return int(json.loads(conf)["rowIdHighWaterMark"])


def materialized_col(meta: dict[str, Any]) -> str | None:
    return (meta.get("configuration") or {}).get(MAT_COL_KEY)


def _num_records(add: dict[str, Any]) -> int:
    stats = add.get("stats")
    if not stats:
        raise ValueError(
            f"add {add.get('path')!r} carries no stats; row tracking "
            "needs per-file numRecords to allocate id ranges"
        )
    return int(json.loads(stats)["numRecords"])


def watermark_action(hwm: int) -> dict[str, Any]:
    return {
        "domainMetadata": {
            "domain": ROW_TRACKING_DOMAIN,
            "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
            "removed": False,
        }
    }


def assign_base_row_ids(
    state: dict[str, Any],
    adds: list[dict[str, Any]],
    commit_version: int,
) -> dict[str, Any]:
    """Stamp ``baseRowId``/``defaultRowCommitVersion`` onto each add
    (in order) from the replayed watermark; returns the domain action
    carrying the new high-water mark. Call INSIDE the commit retry
    loop — a re-replayed state moves the watermark."""
    hwm = high_water_mark(state)
    for a in adds:
        ad = a["add"]
        ad["baseRowId"] = hwm + 1
        ad["defaultRowCommitVersion"] = int(commit_version)
        hwm += _num_records(ad)
    return watermark_action(hwm)


def base_row_id_map(
    table: str, files: dict[str, Any]
) -> list[tuple[str, int]]:
    """[(normalized absolute path, baseRowId)] for a plan's file list
    — the broadcastable side of the fresh-row-id join."""
    out = []
    for rel, a in files.items():
        base = a.get("baseRowId")
        if base is None:
            continue
        absp = rel if os.path.isabs(rel) else os.path.join(table, rel)
        out.append((os.path.normpath(absp), int(base)))
    return out


def enable_row_tracking(spark: SparkSession, table: str) -> int:
    """Turn row tracking ON for an existing table: one commit that
    (a) upgrades the protocol (writer 7, ``rowTracking`` +
    ``domainMetadata``), (b) adds the nullable materialized row-id
    column to the schema and records its name, (c) RE-ADDS every live
    file with a fresh ``baseRowId`` range (backfill — existing rows
    get ids without any data rewrite), and (d) publishes the
    high-water mark domain. Idempotent. Returns the committed
    version."""
    from dst_spark_k8_lakehouse_spark.plans import (
        delta_reader,
        delta_writer,
    )

    state = delta_reader._replay(spark, table, None)
    if enabled(state):
        return int(state["version"])
    meta = state["metaData"]
    mode, _phys = delta_reader._mapping(meta)
    if mode != "none":
        raise NotImplementedError(
            "row tracking on a column-mapped table is not supported "
            "by the jar-free path"
        )
    schema_json = json.loads(meta["schemaString"])
    names = {f["name"] for f in schema_json["fields"]}
    mat = "_row_id_materialized"
    if mat in names:
        raise ValueError(f"column {mat!r} already exists")
    schema_json["fields"] = schema_json["fields"] + [
        {"name": mat, "type": "long", "nullable": True, "metadata": {}}
    ]
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema_json)
    new_meta["configuration"] = {
        **(meta.get("configuration") or {}),
        MAT_COL_KEY: mat,
    }
    p = state.get("protocol") or {}
    actions: list[dict[str, Any]] = [
        {
            "protocol": {
                "minReaderVersion": p.get("minReaderVersion", 1),
                "minWriterVersion": 7,
                **(
                    {"readerFeatures": sorted(
                        set(p.get("readerFeatures") or [])
                    )}
                    if p.get("minReaderVersion", 1) >= 3
                    else {}
                ),
                "writerFeatures": sorted(
                    set(p.get("writerFeatures") or [])
                    | {"rowTracking", "domainMetadata"}
                ),
            }
        },
        {"metaData": new_meta},
    ]
    hwm = -1
    version = int(state["version"]) + 1
    for rel, a in sorted(state["files"].items()):
        re_add = dict(a)
        re_add["baseRowId"] = hwm + 1
        re_add["defaultRowCommitVersion"] = version
        re_add["dataChange"] = False
        hwm += _num_records(a)
        actions.append({"add": re_add})
    actions.append(watermark_action(hwm))
    actions.append(delta_writer._commit_info("ENABLE ROW TRACKING"))
    return delta_writer._commit_from_state(
        spark, table, state, actions, "ENABLE ROW TRACKING",
        check_meta=True,
    )


def attach_row_ids(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    files: dict[str, Any],
    meta: dict[str, Any],
    out_col: str = ROW_ID,
) -> DataFrame:
    """Resolve each row's stable id on a frame that carries the
    ``ROW_FILE``/``ROW_POS`` identity columns:
    ``coalesce(materialized, baseRowId + position)`` via a broadcast
    join on the (tiny) per-file base map."""
    from dst_spark_k8_lakehouse_spark.localrel import local_frame
    from dst_spark_k8_lakehouse_spark.plans import delta_reader

    mat = materialized_col(meta)
    rows = base_row_id_map(table, files)
    # local_frame: no-job broadcast build (r13; an RDD-scan frame
    # costs a Python-worker job per broadcast)
    base_df = F.broadcast(
        local_frame(
            spark, rows, f"{delta_reader.ROW_FILE} string, __base_row_id long"
        )
    )
    df = df.join(base_df, delta_reader.ROW_FILE, "left")
    fresh = F.col("__base_row_id") + F.col(delta_reader.ROW_POS)
    rid = (
        F.coalesce(F.col(mat), fresh)
        if mat and mat in df.columns
        else fresh
    )
    return df.withColumn(out_col, rid).drop("__base_row_id")
