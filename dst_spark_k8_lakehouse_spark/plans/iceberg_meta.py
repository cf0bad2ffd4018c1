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

from dst_spark_k8_lakehouse_spark.localrel import local_frame
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
    return local_frame(
        spark,
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
    return local_frame(spark, rows, schema)


def manifests_table(spark: SparkSession, path: str) -> DataFrame:
    """``tbl.manifests``: the current snapshot's manifest list, with
    the r8 ``partition_summaries`` (contains_null + decoded
    lower/upper bound per partition field, the manifest-level pruning
    tier's inputs — real Iceberg's ``partition_summaries`` column)."""
    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_transforms as tr,
        iceberg_writer as iw,
    )

    meta = _meta(path)
    cur = meta.get("current-snapshot-id")
    specs = iw._specs_by_id(meta)
    by_id = {f["id"]: f for f in meta["schema"]["fields"]}

    def _summaries(mf) -> list[dict] | None:
        parts = mf.get("partitions")
        if parts is None:
            return None
        fields = specs.get(
            int(str(iceberg_reader._get(mf, "partition_spec_id") or 0)),
            [],
        )
        out = []
        for sf, sm in zip(fields, parts):
            lo = hi = None
            try:
                src = by_id.get(sf.get("source-id"))
                stype = (src["type"]
                         if src and isinstance(src["type"], str) else "")
                tname, _p = tr.parse_spec_transform(sf["transform"])
                rt = tr.result_type(tname, stype, sf["name"])
                if sm.get("lower_bound") is not None:
                    lo = str(tr.summary_bound_value(
                        bytes(sm["lower_bound"]), rt
                    ))
                if sm.get("upper_bound") is not None:
                    hi = str(tr.summary_bound_value(
                        bytes(sm["upper_bound"]), rt
                    ))
            except Exception:
                lo = hi = None  # undecodable foreign summary
            out.append({
                "field": sf["name"],
                "contains_null": bool(sm.get("contains_null")),
                "lower_bound": lo,
                "upper_bound": hi,
            })
        return out

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
                    _summaries(mf),
                )
            )
    return spark.createDataFrame(
        rows,
        "path string, length long, content int, "
        "sequence_number long, added_snapshot_id long, "
        "partition_summaries array<struct<field string, "
        "contains_null boolean, lower_bound string, "
        "upper_bound string>>",
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
    return local_frame(
        spark,
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
    return local_frame(
        spark, rows, "name string, type string, snapshot_id long"
    )


def read_iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Rows APPENDED in ``(from_snapshot, to_snapshot]`` — the
    incremental-consumer feed. Walks the ANCESTRY chain from ``to``
    back to ``from`` (r10 — an id-ordered range would leak snapshots
    that merely INTERLEAVE in commit time: a WAP branch staged between
    two main commits sits inside the id range while never being part
    of main's lineage, so its rows would feed consumers before — or
    without — ever being published). Each chain snapshot's manifests
    are scanned for status-1 entries added BY it; any non-append
    operation in the range raises (its effect cannot be expressed as
    appended rows)."""
    meta = _meta(path)
    by_id = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
    ids = sorted(by_id)
    if from_snapshot not in by_id:
        raise ValueError(
            f"from_snapshot {from_snapshot} not in table ({ids[:5]}…)"
        )
    if to_snapshot is None:
        to_snapshot = int(meta["current-snapshot-id"])
    if to_snapshot not in by_id:
        raise ValueError(
            f"to_snapshot {to_snapshot} not in table ({ids[:5]}…)"
        )
    from dst_spark_k8_lakehouse_spark.plans.iceberg_writer import (
        _ancestry,
    )

    chain = _ancestry(meta, int(to_snapshot))
    if from_snapshot in chain:
        in_range = [
            by_id[sid] for sid in reversed(chain)
            if from_snapshot < sid <= to_snapshot
            and sid != from_snapshot
        ]
    elif not any(
        "parent-snapshot-id" in s for s in by_id.values()
    ):
        # pre-r10 table: no parent links recorded, single lineage by
        # construction — the id range IS the ancestry
        in_range = [
            by_id[sid] for sid in ids
            if from_snapshot < sid <= to_snapshot
        ]
    else:
        raise ValueError(
            f"from_snapshot {from_snapshot} is not an ancestor of "
            f"{to_snapshot} — the snapshots sit on different "
            "lineages (e.g. an unpublished branch)"
        )
    files: list[str] = []
    for s in in_range:
        sid = int(s["snapshot-id"])
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
            # only the manifests THIS snapshot added carry its appended
            # files — the manifest-level attribution real Iceberg scans
            # by. (It also makes the walk O(new manifests), not
            # O(total); and a CHERRY-PICKED snapshot's manifests carry
            # the ORIGINAL stage snapshot's per-entry ids, so the old
            # per-entry filter dropped published rows from the feed.)
            if int(str(
                iceberg_reader._get(mf, "added_snapshot_id") or 0
            )) != sid:
                continue
            for entry in iceberg_reader._avro_records(
                spark,
                iceberg_reader._strip_uri(str(mf.get("manifest_path"))),
            ):
                if int(str(entry.get("status"))) != 1:
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


CHANGE_TYPE = "_change_type"
SNAPSHOT_ORDINAL = "_snapshot_ordinal"


def read_iceberg_changelog(
    spark: SparkSession,
    path: str,
    from_snapshot: int | None = None,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Row-level CHANGELOG of ``(from_snapshot, to_snapshot]`` — the
    Iceberg counterpart of Delta's Change Data Feed (real Iceberg's
    ``create_changelog_view`` procedure), jar-free. Emits the table
    schema plus ``_change_type`` (``insert`` / ``delete``) and
    ``_snapshot_ordinal`` (the snapshot's 1-based position in the
    table history — deterministic, unlike timestamp-derived ids).

    Per in-range snapshot:

    - data files ADDED by it → insert rows; files logically DELETED
      by it (COW DML's status-2 bookkeeping entries) → delete rows —
      with CARRYOVER CANCELLATION (``exceptAll`` both ways), so a
      copy-on-write rewrite contributes only its NET row changes, not
      the untouched rows it happened to move between files (the
      ``remove_carryovers`` behavior of the real procedure);
    - POSITION-delete files added by it → the deleted rows, resolved
      by ``(file, pos)`` against the referenced data files;
    - EQUALITY-delete files added by it → the PREVIOUS snapshot's
      visible rows matching the keys (one semi-join per key set).

    Cost: bounded by each snapshot's TOUCHED files (plus, for
    equality deletes, one pass over the prior snapshot — the price of
    materializing deleted rows, same as the real procedure). Raises
    when a referenced pre-change file was already expired — an
    expired range has no reconstructible changelog."""
    import os

    from pyspark.sql import functions as F

    meta = _meta(path)
    snaps = list(meta.get("snapshots", []))  # commit order
    ids = [int(s["snapshot-id"]) for s in snaps]
    if to_snapshot is None:
        to_snapshot = int(meta["current-snapshot-id"])
    if to_snapshot not in ids:
        raise ValueError(
            f"to_snapshot {to_snapshot} not in table ({ids[:5]}…)"
        )
    if from_snapshot is not None and from_snapshot not in ids:
        raise ValueError(
            f"from_snapshot {from_snapshot} not in table ({ids[:5]}…)"
        )
    # walk the ANCESTRY of `to`, not commit order (r10, with WAP): an
    # unpublished branch snapshot interleaves in the snapshots list
    # and would otherwise contribute change rows main never saw. The
    # chain also supplies each snapshot's true PREVIOUS state for
    # equality-delete resolution (its parent, not whatever committed
    # before it). Parent-less pre-r10 tables are single-lineage by
    # construction: commit order IS the ancestry there.
    from dst_spark_k8_lakehouse_spark.plans.iceberg_writer import (
        _ancestry,
    )

    chain = list(reversed(_ancestry(meta, int(to_snapshot))))
    by_sid = {int(s["snapshot-id"]): (i, s) for i, s in enumerate(snaps)}
    if from_snapshot is None or from_snapshot in chain:
        start = (
            chain.index(from_snapshot) + 1
            if from_snapshot is not None else 0
        )
        # ordinal = 1-based position on the lineage from the root
        walk = [
            (pos + 1, chain[pos - 1] if pos else None,
             by_sid[chain[pos]][1])
            for pos in range(start, len(chain))
        ]
    elif not any("parent-snapshot-id" in s for s in snaps):
        lo = ids.index(from_snapshot) if from_snapshot in ids else -1
        hi = ids.index(to_snapshot)
        walk = [
            (i + 1, ids[i - 1] if i else None, snaps[i])
            for i in range(lo + 1, hi + 1)
        ]
    else:
        raise ValueError(
            f"from_snapshot {from_snapshot} is not an ancestor of "
            f"{to_snapshot} — the snapshots sit on different "
            "lineages (e.g. an unpublished branch)"
        )
    schema = None
    for s in meta.get("schemas", []):
        if s.get("schema-id") == meta.get("current-schema-id"):
            schema = s
    if schema is None:
        schema = meta.get("schema")
    cols = [f["name"] for f in schema["fields"]]
    by_id = {int(f["id"]): f["name"] for f in schema["fields"]}
    norm = lambda c: F.expr(  # noqa: E731
        iceberg_reader._NORM_FILE.format(col=c)
    )

    def _tag(df: DataFrame, kind: str, ordinal: int) -> DataFrame:
        return df.select(*cols).withColumn(
            CHANGE_TYPE, F.lit(kind)
        ).withColumn(SNAPSHOT_ORDINAL, F.lit(ordinal))

    out: DataFrame | None = None
    for ordinal, prev_sid, s in walk:
        sid = int(s["snapshot-id"])
        added_data: list[str] = []
        removed_data: list[str] = []
        added_pos: list[str] = []
        added_eq: list[tuple[str, tuple[int, ...]]] = []
        for mf in iceberg_reader._avro_records(spark, s["manifest-list"]):
            manifest = iceberg_reader._strip_uri(
                str(mf.get("manifest_path"))
            )
            ml_content = int(
                str(iceberg_reader._get(mf, "content") or 0)
            )
            for e in iceberg_reader._avro_records(spark, manifest):
                e_snap = iceberg_reader._get(e, "snapshot_id")
                if e_snap is None or int(str(e_snap)) != sid:
                    continue
                status = int(str(e.get("status")))
                d = e.get("data_file")
                p = iceberg_reader._strip_uri(str(d.get("file_path")))
                content = int(
                    str(iceberg_reader._get(d, "content") or ml_content)
                )
                if content == 0:
                    if status == 1:
                        added_data.append(p)
                    elif status == 2:
                        removed_data.append(p)
                elif content == 1 and status == 1:
                    added_pos.append(p)
                elif content == 2 and status == 1:
                    ids_t = tuple(
                        sorted(
                            int(str(x))
                            for x in iceberg_reader._get(
                                d, "equality_ids"
                            ) or ()
                        )
                    )
                    added_eq.append((p, ids_t))
        missing = [
            p for p in added_data + removed_data
            if not os.path.exists(p)
        ]
        if missing:
            raise ValueError(
                f"changelog for snapshot {sid} references expired "
                f"file(s) (first: {missing[0]}); the range is not "
                "reconstructible"
            )
        ins = (
            iceberg_reader.read_data_files(spark, added_data, schema)
            if added_data else None
        )
        dels = (
            iceberg_reader.read_data_files(spark, removed_data, schema)
            if removed_data else None
        )
        if ins is not None and dels is not None:
            # carryover cancellation: a COW rewrite's unchanged rows
            # appear in both sides and cancel to the NET change
            ins_net = ins.select(*cols).exceptAll(dels.select(*cols))
            dels_net = dels.select(*cols).exceptAll(ins.select(*cols))
            ins, dels = ins_net, dels_net
        pieces = []
        if ins is not None:
            pieces.append(_tag(ins, "insert", ordinal))
        if dels is not None:
            pieces.append(_tag(dels, "delete", ordinal))
        if added_pos:
            refs = (
                spark.read.schema("file_path string, pos long")
                .parquet(*added_pos)
                .select(
                    norm("file_path").alias("__f"),
                    F.col("pos").alias("__p"),
                )
            )
            targets = sorted(
                {r["__f"] for r in refs.select("__f").distinct()
                 .collect()}
            )
            if targets:
                scan = (
                    iceberg_reader.read_data_files(
                        spark, targets, schema
                    )
                    .withColumn("__f", norm("_metadata.file_path"))
                    .withColumn("__p", F.col("_metadata.row_index"))
                )
                pieces.append(
                    _tag(
                        scan.join(
                            F.broadcast(refs), ["__f", "__p"],
                            "left_semi",
                        ),
                        "delete",
                        ordinal,
                    )
                )
        if added_eq:
            if prev_sid is None:
                raise ValueError(
                    "equality-delete changelog needs a prior snapshot"
                )
            prev_df = iceberg_reader.read_iceberg(
                spark, path, snapshot_id=prev_sid
            )
            for ids_t in sorted({t for _p, t in added_eq}):
                key_cols = [by_id[x] for x in ids_t]
                keys = spark.read.parquet(
                    *[p for p, t in added_eq if t == ids_t]
                ).select(*key_cols).distinct()
                pieces.append(
                    _tag(
                        prev_df.join(
                            F.broadcast(keys), key_cols, "left_semi"
                        ),
                        "delete",
                        ordinal,
                    )
                )
        for piece in pieces:
            out = piece if out is None else out.unionByName(piece)
    if out is None:
        struct = iceberg_reader._schema_struct(schema)
        empty = spark.createDataFrame([], struct)
        return empty.withColumn(
            CHANGE_TYPE, F.lit(None).cast("string")
        ).withColumn(SNAPSHOT_ORDINAL, F.lit(None).cast("int"))
    return out
