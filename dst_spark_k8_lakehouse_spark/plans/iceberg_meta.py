"""Iceberg METADATA TABLES and the INCREMENTAL APPEND SCAN — the
introspection surface real Iceberg exposes as ``SELECT * FROM
tbl.files / .partitions / .manifests / .history / .snapshots /
.refs`` (``02_iceberg_demo.ipynb:143`` queries ``.snapshots``) and
``spark.read.option("start-snapshot-id", …)`` incremental reads.

All metadata tables are built DRIVER-SIDE from the same manifest walk
the reader plans with (`_snapshot_entries`) — KB-scale Avro, no data
scan — then surfaced as small DataFrames so they compose with any
query. ``.partitions`` is the one operators actually monitor at
100 TB (skew, small-file pressure per partition): its numbers come
from manifest ``record_count``/``file_size_in_bytes`` sums, never
from reading data.

``read_iceberg_incremental(table, from_snapshot, to_snapshot)``
returns exactly the rows APPENDED in ``(from, to]`` — each
snapshot's status-1 (ADDED) data-file entries — the feed a
downstream incremental consumer tails instead of re-scanning the
table. Non-append snapshots in the range (overwrite / delete /
replace) raise loudly, matching real Iceberg's incremental-scan
contract.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dst_spark_k8_lakehouse_spark.plans import iceberg_reader


def _meta(path: str) -> dict:
    with open(iceberg_reader._current_metadata_file(path)) as fh:
        return json.load(fh)


def _current_entries(spark: SparkSession, path: str):
    meta = _meta(path)
    cur = meta.get("current-snapshot-id")
    if not cur or int(cur) == -1:
        return meta, [], [], []
    snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
    spec_fields = iceberg_reader._default_spec_fields(meta)
    data, pos, eq = iceberg_reader._snapshot_entries(
        spark, snaps[int(cur)], spec_fields
    )
    return meta, data, pos, eq


def files_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.files``: one row per live file (data AND delete files,
    the v2 shape) with content kind, row count and size."""
    rows: list[tuple] = []
    meta, data, pos, eq = _current_entries(spark, path)
    for e in data:
        rows.append((e["path"], 0, "data", e["seq"]))
    for e in pos:
        rows.append((e["path"], 1, "position_deletes", e["seq"]))
    for e in eq:
        rows.append((e["path"], 2, "equality_deletes", e["seq"]))
    import os

    import pyarrow.parquet as pq

    out = [
        (p, content, kind, seq,
         pq.ParquetFile(p).metadata.num_rows, os.path.getsize(p))
        for p, content, kind, seq in rows
    ]
    return spark.createDataFrame(
        out,
        "file_path string, content int, content_kind string, "
        "sequence_number long, record_count long, "
        "file_size_in_bytes long",
    )


def partitions_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.partitions``: per-partition live record/file/byte counts
    from the MANIFEST numbers (no data scan) — the small-file /
    skew dashboard an operator watches at scale."""
    meta = _meta(path)
    spec_fields = iceberg_reader._default_spec_fields(meta)
    part_names = [sf["name"] for sf in spec_fields]
    agg: dict[tuple, list[int]] = {}
    snaps = {
        int(s["snapshot-id"]): s for s in meta.get("snapshots", [])
    }
    cur = meta.get("current-snapshot-id")
    if cur and int(cur) != -1:
        for mf in iceberg_reader._avro_records(
            spark, snaps[int(cur)]["manifest-list"]
        ):
            if int(str(iceberg_reader._get(mf, "content") or 0)) != 0:
                continue
            for entry in iceberg_reader._avro_records(
                spark,
                iceberg_reader._strip_uri(str(mf.get("manifest_path"))),
            ):
                if int(str(entry.get("status"))) == 2:
                    continue
                d = entry.get("data_file")
                if int(str(iceberg_reader._get(d, "content") or 0)) != 0:
                    continue
                pv = iceberg_reader._partition_values(d, spec_fields)
                key = tuple(pv.get(c) for c in part_names)
                a = agg.setdefault(key, [0, 0, 0])
                a[0] += int(str(d.get("record_count")))
                a[1] += 1
                a[2] += int(str(d.get("file_size_in_bytes")))
    rows = [
        (*[None if v is None else str(v) for v in key], n, f, b)
        for key, (n, f, b) in sorted(agg.items(), key=lambda kv: str(kv))
    ]
    cols = ", ".join(f"`{c}` string" for c in part_names)
    schema = (f"{cols}, " if cols else "") + (
        "record_count long, file_count long, total_size_bytes long"
    )
    return spark.createDataFrame(rows, schema)


def manifests_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.manifests``: the current snapshot's manifest list."""
    meta = _meta(path)
    cur = meta.get("current-snapshot-id")
    rows = []
    if cur and int(cur) != -1:
        snaps = {
            int(s["snapshot-id"]): s for s in meta.get("snapshots", [])
        }
        for mf in iceberg_reader._avro_records(
            spark, snaps[int(cur)]["manifest-list"]
        ):
            rows.append(
                (
                    str(mf.get("manifest_path")),
                    int(str(mf.get("manifest_length"))),
                    int(str(iceberg_reader._get(mf, "content") or 0)),
                    int(str(
                        iceberg_reader._get(mf, "sequence_number") or 0
                    )),
                    int(str(mf.get("added_snapshot_id") or 0)),
                )
            )
    return spark.createDataFrame(
        rows,
        "path string, length long, content int, "
        "sequence_number long, added_snapshot_id long",
    )


def history_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.history``: the snapshot log (when each snapshot became
    current)."""
    meta = _meta(path)
    cur = int(meta.get("current-snapshot-id") or -1)
    rows = [
        (int(e["timestamp-ms"]), int(e["snapshot-id"]),
         int(e["snapshot-id"]) == cur)
        for e in meta.get("snapshot-log") or []
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at_ms long, snapshot_id long, is_current boolean",
    )


def refs_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.refs``: named tags/branches."""
    meta = _meta(path)
    rows = [
        (name, r.get("type", "tag"), int(r["snapshot-id"]))
        for name, r in sorted((meta.get("refs") or {}).items())
    ]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot_id long"
    )


def read_iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Rows APPENDED in ``(from_snapshot, to_snapshot]`` — the
    incremental-consumer feed. Walks each in-range snapshot's
    manifests for status-1 entries added BY that snapshot; any
    non-append operation in the range raises (its effect cannot be
    expressed as appended rows)."""
    meta = _meta(path)
    snaps = sorted(
        meta.get("snapshots", []), key=lambda s: int(s["snapshot-id"])
    )
    ids = [int(s["snapshot-id"]) for s in snaps]
    if from_snapshot not in ids:
        raise ValueError(
            f"from_snapshot {from_snapshot} not in table ({ids[:5]}…)"
        )
    if to_snapshot is None:
        to_snapshot = int(meta["current-snapshot-id"])
    if to_snapshot not in ids:
        raise ValueError(
            f"to_snapshot {to_snapshot} not in table ({ids[:5]}…)"
        )
    files: list[str] = []
    for s in snaps:
        sid = int(s["snapshot-id"])
        if not (from_snapshot < sid <= to_snapshot):
            continue
        op = (s.get("summary") or {}).get("operation", "append")
        if op != "append":
            raise ValueError(
                f"snapshot {sid} is {op!r}: the incremental append "
                "scan covers append-only ranges (real Iceberg's "
                "contract); read full snapshots instead"
            )
        for mf in iceberg_reader._avro_records(spark, s["manifest-list"]):
            if int(str(iceberg_reader._get(mf, "content") or 0)) != 0:
                continue
            for entry in iceberg_reader._avro_records(
                spark,
                iceberg_reader._strip_uri(str(mf.get("manifest_path"))),
            ):
                if int(str(entry.get("status"))) != 1:
                    continue
                e_snap = iceberg_reader._get(entry, "snapshot_id")
                if e_snap is not None and int(str(e_snap)) != sid:
                    continue
                d = entry.get("data_file")
                files.append(
                    iceberg_reader._strip_uri(str(d.get("file_path")))
                )
    schema = None
    for s in meta.get("schemas", []):
        if s.get("schema-id") == meta.get("current-schema-id"):
            schema = s
    if schema is None:
        schema = meta.get("schema")
    return iceberg_reader.read_data_files(spark, files, schema)
