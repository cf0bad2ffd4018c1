"""Read-only Delta Lake table reader — pure Python over the PUBLIC
Delta transaction-log protocol (no jars).

The one gap the container forces (``delta-spark`` uninstallable, see
``delta_backend.py``) splits in two: WRITING Delta needs the native
commit protocol (jar), but READING only needs the documented log
format (delta.io protocol spec, PROTOCOL.md: JSON commit files under
``_delta_log/`` containing ``metaData`` / ``add`` / ``remove`` /
``protocol`` actions, plus optional parquet checkpoints referenced by
``_last_checkpoint``). A reference user pointing this engine at a
Delta table written by their existing Delta 3.x pipeline can SELECT
from it — including time travel — with no Delta runtime:

- the log is replayed in version order (checkpoint first when
  present), keeping the last ``metaData`` and the add-minus-remove
  active file set;
- data files are read with ``spark.read.parquet`` against the
  resolved file list. Partition columns live in the log's
  ``partitionValues``, NOT in the data files. When every active file
  sits in a consistent Hive-style layout (``col=val/…``, the layout
  both this engine's writer and real Delta produce), the whole table
  is ONE parquet scan with ``basePath``-driven partition columns —
  partition predicates become scan-level PartitionFilters and the
  plan stays O(1) in partition count. Files in a nonstandard layout
  fall back to per-partition-group literal injection (fine at tens of
  groups, the reason the Hive path exists for 100k-partition tables);
- ``partition_filter`` prunes the FILE LIST driver-side (the same
  place Delta's own log replay prunes) before any scan is built, so
  a one-partition read of a 100k-partition table lists one
  partition's files;
- ``version=N`` replays only commits ``<= N`` (a checkpoint above N
  is ignored and the JSON commits replayed from 0 — correctness over
  speed for the time-travel path);
- column mapping is applied in BOTH modes: ``name`` mode (what
  ``delta_writer.rename_column`` and real Delta's ALTER ... RENAME
  produce) reads data files by each column's
  ``delta.columnMapping.physicalName`` and aliases to the logical
  name; ``id`` mode matches file columns by embedded parquet field id
  against ``delta.columnMapping.id`` (Spark's field-id resolution),
  with a loud guard when the files carry no ids.

Write paths still raise toward ``VersionedTable`` / the jar-guarded
backend; this module never mutates ``_delta_log``.

DELETION VECTORS (the protocol's merge-on-read deletes, reader
feature ``deletionVectors``) are applied: each vectored add's bitmap
decodes driver-side (``plans/delta_dv`` / ``plans/roaring``) and the
deleted ``(file, row_index)`` pairs are anti-joined out of the scan.
Write side: ``plans/delta_dv.delete_where_dv``.

Scale note: log replay is driver-side file-list work (the same place
Delta's own Scala reader does it); the data read is an ordinary
parquet scan, so pushdown/pruning behave like any other scan.
Remaining reader feature gaps are LOUD: unknown reader features and
id-mode tables whose files lack field ids raise
``NotImplementedError`` instead of returning wrong rows.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Any, Callable
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.plans import delta_columnar

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# r9: planning keeps checkpoint adds / commit add batches as Arrow
# tables and prunes them with Arrow compute (plans/delta_columnar) —
# ~30 µs/add of dict materialization only for KEPT files. False forces
# the classic dict replay; tests/test_delta_columnar.py pins the two
# paths to identical file lists.
CP_COLUMNAR = True

# partition_filter: {col: value-or-list} equality (compared against the
# log's string representation) or a predicate over {col: str|None}
PartitionFilter = dict[str, Any] | Callable[[dict[str, str | None]], bool]


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def is_delta_table(path: str) -> bool:
    """A directory with a ``_delta_log`` containing at least one
    commit or checkpoint is a Delta table."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return False
    return any(
        f.endswith(".json")
        or (".checkpoint." in f and f.endswith(".parquet"))
        for f in os.listdir(d)
    )

def _commit_files(path: str) -> list[tuple[int, str]]:
    if not os.path.isdir(_log_dir(path)):
        return []
    out = []
    for f in os.listdir(_log_dir(path)):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append((int(f[:-5]), os.path.join(_log_dir(path), f)))
    return sorted(out)


def _checkpoint(path: str) -> tuple[int, list[str]] | None:
    """(version, checkpoint parquet files) from ``_last_checkpoint``,
    or None. Multi-part checkpoints list all their parts."""
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as fh:
        meta = json.load(fh)
    v = int(meta["version"])
    parts = meta.get("parts")
    if parts:
        files = [
            os.path.join(
                _log_dir(path),
                f"{v:020d}.checkpoint.{p + 1:010d}.{parts:010d}.parquet",
            )
            for p in range(int(parts))
        ]
    else:
        classic = os.path.join(
            _log_dir(path), f"{v:020d}.checkpoint.parquet"
        )
        if os.path.exists(classic):
            files = [classic]
        else:
            # V2 checkpoints are UUID-named ({v}.checkpoint.{uuid}.
            # parquet) and the spec's _last_checkpoint does not carry
            # the name — readers discover them by listing. Any one of
            # several is complete; take the lexicographic max.
            cands = sorted(
                f
                for f in os.listdir(_log_dir(path))
                if f.startswith(f"{v:020d}.checkpoint.")
                and f.endswith(".parquet")
            )
            if not cands:
                return None  # stale/foreign hint; replay JSON only
            files = [os.path.join(_log_dir(path), cands[-1])]
    return v, files


_READER_FEATURES_OK = {"appendOnly", "invariants", "checkConstraints",
                       "timestampNtz", "vacuumProtocolCheck",
                       "columnMapping", "deletionVectors",
                       "v2Checkpoint", "typeWidening"}


# row-identity columns a scan can expose (read_delta
# with_row_identity=True keeps them; the DV write path keys on them)
ROW_FILE = "__delta_row_file"
ROW_POS = "__delta_row_pos"


def _add_row_identity(df: DataFrame) -> DataFrame:
    """Attach each row's (normalized file path, row index) as REGULAR
    columns — must happen while the plan still resolves ``_metadata``
    (before any join breaks metadata propagation)."""
    norm = F.expr(
        "regexp_replace(regexp_replace(_metadata.file_path,"
        " '^file:', ''), '^/+', '/')"
    )
    return df.withColumn(ROW_FILE, norm).withColumn(
        ROW_POS, F.col("_metadata.row_index")
    )


def _dv_row_filter(
    spark: SparkSession, df: DataFrame, table: str,
    files: dict[str, Any],
) -> DataFrame:
    """Subtract deletion-vector rows from a scan carrying the
    ``ROW_FILE``/``ROW_POS`` identity columns: decode each vectored
    add's bitmap driver-side (``plans/delta_dv`` — DV blobs are
    metadata-sized) and anti-join against a ``LocalRelation``
    (``localrel.local_frame``: its broadcast builds driver-side, no
    Spark job) — exactly the protocol's row-index space. No-op when
    no scanned file carries a descriptor."""
    from dst_spark_k8_lakehouse_spark.localrel import local_frame
    from dst_spark_k8_lakehouse_spark.plans import delta_dv

    rows: list[tuple[str, int]] = []
    for rel, a in files.items():
        d = a.get("deletionVector")
        if not d:
            continue
        absp = rel if os.path.isabs(rel) else os.path.join(table, rel)
        nrm = os.path.normpath(absp)
        rows += [
            (nrm, int(p)) for p in delta_dv.dv_positions(table, d)
        ]
    if not rows:
        return df
    dels = F.broadcast(
        local_frame(spark, rows, f"{ROW_FILE} string, {ROW_POS} long")
    )
    return df.join(dels, [ROW_FILE, ROW_POS], "left_anti")


def _apply_action(state: dict[str, Any], action: dict[str, Any]) -> None:
    if "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "add" in action:
        a = action["add"]
        state["files"][a["path"]] = a
    elif "remove" in action:
        state["files"].pop(action["remove"]["path"], None)
    elif "txn" in action:
        # SetTransaction (spec): highest committed version per appId —
        # the idempotence handle streaming sinks replay against
        t = action["txn"]
        cur = state["txns"].get(t["appId"], -1)
        state["txns"][t["appId"]] = max(cur, int(t["version"]))
    elif "protocol" in action:
        p = action["protocol"]
        feats = set(p.get("readerFeatures") or [])
        if p.get("minReaderVersion", 1) > 3 or (feats - _READER_FEATURES_OK):
            raise NotImplementedError(
                "Delta reader features beyond this reader: "
                f"{sorted(feats - _READER_FEATURES_OK) or p}"
            )
        state["protocol"] = p  # retained so checkpoints can carry it
    elif "domainMetadata" in action:
        # spec "Domain Metadata": named per-domain configuration with
        # last-writer-wins semantics; a removed=true tombstone drops
        # the domain. Liquid clustering (delta.clustering) lives here.
        dm = action["domainMetadata"]
        doms = state.setdefault("domains", {})
        if dm.get("removed"):
            doms.pop(dm["domain"], None)
        else:
            doms[dm["domain"]] = dm.get("configuration")


def _replay(
    spark: SparkSession, path: str, version: int | None,
    lazy: bool = False, lazy_tail: bool | None = None,
) -> dict:
    """``lazy=True`` (the PLANNING path) keeps add actions columnar:
    ``state["batches"]`` holds ``{"tbl": Arrow add table, "dropped":
    set of paths invalidated by LATER actions}`` entries next to the
    ordinary ``state["files"]`` dict (which then carries only the
    adds that had to materialize). Only ``plan_file_list`` passes it,
    and ``_pruned_files`` resolves batches to dicts (post-pruning)
    before anything downstream sees the file list. The point: an
    append-mostly log replays with ZERO per-add Python — liveness is
    a per-batch set, not a per-path dict.

    ``lazy_tail`` (default: follow ``lazy``): keep the JSON commit
    TAIL columnar too. When the caller has nothing to prune, the
    pyarrow.json parse + Arrow→dict materialization is pure overhead
    over ``json.loads`` (~1.7× on a 10k-add tail, judge-measured in
    r9) while the CHECKPOINT columnar load wins even unpruned (the
    checkpoint is already parquet) — so ``plan_file_list`` passes
    ``lazy_tail=False`` for no-predicate full plans."""
    state: dict[str, Any] = {
        "files": {}, "metaData": None, "protocol": None, "txns": {},
        "domains": {},
        "batches": [],
        # highest log version this state reflects — state-dependent
        # commits MUST claim exactly version+1 (put-if-absent), so a
        # commit that raced in after this replay forces EEXIST and the
        # caller's conflict check, instead of being silently absorbed
        # by a fresh _next_version directory listing (the lost-update
        # shape the two-process race test caught in r8)
        "version": -1,
    }
    lazy = lazy and CP_COLUMNAR
    lazy_tail = lazy and (lazy_tail if lazy_tail is not None else True)
    commits = _commit_files(path)
    if not commits and _checkpoint(path) is None:
        raise ValueError(f"no Delta log at {path}")
    start = 0
    cp = _checkpoint(path)
    if cp is not None and (version is None or cp[0] <= version):
        cp_v, cp_files = cp
        got = delta_columnar.load_checkpoint(cp_files) if lazy else None
        if got is not None:
            tbl, others = got
            for act in others:
                _lazy_apply(state, act)
            state["batches"].append({"tbl": tbl, "dropped": set()})
        else:
            for d in _checkpoint_rows(spark, cp_files):
                for key in (
                    "metaData", "add", "remove", "protocol", "txn",
                    "domainMetadata",
                ):
                    if d.get(key) is not None:
                        _apply_action(state, {key: d[key]})
        start = cp_v + 1
        state["version"] = cp_v
    if commits and commits[0][0] > start:
        # the log was CLEANED below the earliest retained commit
        # (delta.logRetentionDuration) and this replay needs files
        # from the cleaned region — raise instead of silently
        # reconstructing a partial state
        raise ValueError(
            f"Delta log at {path} starts at version {commits[0][0]} "
            f"(older commits cleaned per retention); "
            + (
                f"version {version} is no longer reconstructable"
                if version is not None
                else "no checkpoint covers the cleaned region"
            )
        )
    seen_any = start > 0
    # lazy tail: buffer consecutive add lines ACROSS commit files and
    # parse them as ONE Arrow batch — pyarrow.json has a ~2 ms fixed
    # cost per call, so per-commit batches would be SLOWER than
    # json.loads for small commits. Non-add lines are json.loads'd at
    # encounter; metaData (parse schema may change) and remove /
    # out-of-line add actions (sequencing against buffered adds)
    # flush first, so ordering stays exact.
    buf: list[str] = []
    for v, f in commits:
        if v < start or (version is not None and v > version):
            continue
        seen_any = True
        state["version"] = max(state["version"], v)
        with open(f) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        if not lazy:
            for line in lines:
                _apply_action(state, json.loads(line))
            continue
        if not lazy_tail:
            # classic tail under a columnar checkpoint: _lazy_apply
            # keeps the checkpoint batch's liveness set honest
            for line in lines:
                _lazy_apply(state, json.loads(line))
            continue
        for ln in lines:
            if ln.startswith('{"add":'):
                buf.append(ln)
                continue
            act = json.loads(ln)
            if (
                "metaData" in act or "remove" in act or "add" in act
            ):
                _flush_tail(state, buf)
            _lazy_apply(state, act)
    if lazy:
        _flush_tail(state, buf)
    if version is not None:
        available = [v for v, _ in commits]
        if not seen_any or (available and version < available[0] and start == 0):
            raise ValueError(
                f"version {version} not available at {path} "
                f"(commits: {available[:3]}…)"
            )
    if state["metaData"] is None:
        raise ValueError(f"no metaData action found in Delta log at {path}")
    return state


def _pv_fields(meta: dict[str, Any]) -> list[str] | None:
    """Partition-value keys an add's ``partitionValues`` may carry —
    both the physical and the raw metaData spellings (real Delta
    stores physical names there under column mapping; this writer
    stores logical)."""
    try:
        schema = schema_from_json(meta["schemaString"])
        _mode, phys = _mapping(meta)
        pcs = _partition_cols(meta, schema, phys)
        return list(dict.fromkeys(
            [phys.get(c, c) for c in pcs]
            + list(meta.get("partitionColumns") or [])
        ))
    except Exception:
        return None


def _lazy_apply(state: dict[str, Any], action: dict[str, Any]) -> None:
    """``_apply_action`` that also keeps the columnar batches honest:
    an add or remove of a path invalidates that path in every EARLIER
    batch (per-batch ``dropped`` set — O(actions), never O(files))."""
    if "remove" in action or "add" in action:
        p = (action.get("remove") or action["add"])["path"]
        for b in state["batches"]:
            b["dropped"].add(p)
    _apply_action(state, action)


def _flush_tail(state: dict[str, Any], buf: list[str]) -> None:
    """Parse the buffered ``{"add":…}`` lines as ONE Arrow batch and
    register it (with within-batch re-adds resolved keep-LAST and
    earlier batches'/dict adds' same paths invalidated). Any shape
    the explicit protocol schema rejects replays the buffer the
    classic way instead."""
    if not buf:
        return
    lines = buf[:]
    buf.clear()
    batch = None
    if state["metaData"] is not None:
        pv_fields = _pv_fields(state["metaData"])
        if pv_fields is not None:
            batch = delta_columnar.parse_add_lines(lines, pv_fields)
            if batch is not None:
                batch = delta_columnar.dedup_last(batch)
    if batch is None:
        for ln in lines:
            _lazy_apply(state, json.loads(ln))
        return
    if state["batches"] or state["files"]:
        paths = batch.column("path").to_pylist()
        for b in state["batches"]:
            b["dropped"].update(paths)
        for p in paths:
            state["files"].pop(p, None)
    state["batches"].append({"tbl": batch, "dropped": set()})


def table_stats(spark: SparkSession, path: str) -> dict[str, Any]:
    """Head-snapshot aggregates — ``{"version", "numFiles",
    "tableSizeBytes", "numDeletionVectors", "source"}`` — from the
    version CHECKSUM sidecar (``{v}.crc``, maintained by every
    library commit) when one exists at the head, else from a full
    replay. The crc path is O(1) regardless of log size: on a 100 TB
    table with ~1M adds, "how many files / how many bytes" stops
    costing a million-action replay. ``source`` says which path
    answered, so monitoring can alert on crc-chain gaps."""
    commits = _commit_files(path)
    head = commits[-1][0] if commits else -1
    cp = _checkpoint(path)
    if cp is not None:
        head = max(head, cp[0])
    if head < 0:
        raise ValueError(f"no Delta log at {path}")
    crc = os.path.join(_log_dir(path), f"{head:020d}.crc")
    if os.path.exists(crc):
        with open(crc) as fh:
            doc = json.load(fh)
        return {
            "version": head,
            "numFiles": doc["numFiles"],
            "tableSizeBytes": doc["tableSizeBytes"],
            "numDeletionVectors": doc.get("numDeletionVectorsOpt", 0),
            "source": "crc",
        }
    state = _replay(spark, path, None)
    files = state["files"]
    return {
        "version": int(state["version"]),
        "numFiles": len(files),
        "tableSizeBytes": sum(int(a["size"]) for a in files.values()),
        "numDeletionVectors": sum(
            1 for a in files.values() if a.get("deletionVector")
        ),
        "source": "replay",
    }


def _v2_checkpoint_rows(top_file: str) -> list[dict]:
    """EXACT dict-path read of a V2 (sidecar) checkpoint: top-level
    actions first (checkpointMetadata rows fall out naturally — every
    action key the replay consumes is null on them), then every
    sidecar's file actions. Errors RAISE: a v2-NAMED checkpoint is
    unambiguous, and any row-wise fallback that read the top-level
    file alone would silently replay an EMPTY table."""
    import pyarrow.parquet as pq

    t = pq.read_table(top_file)
    paths = delta_columnar.schema_map_paths(t.schema)
    rows: list[dict] = []
    sidecar_files: list[str] = []
    for raw in t.to_pylist():
        raw = delta_columnar.convert_maps(raw, paths)
        sc = raw.get("sidecar")
        if sc is not None:
            sidecar_files.append(
                os.path.join(
                    os.path.dirname(top_file), "_sidecars", sc["path"]
                )
            )
        else:
            rows.append(raw)
    for st in delta_columnar.read_sidecar_tables(sidecar_files):
        sp = delta_columnar.schema_map_paths(st.schema)
        for raw in st.to_pylist():
            rows.append(delta_columnar.convert_maps(raw, sp))
    return rows


def _checkpoint_rows(spark: SparkSession, cp_files: list[str]):
    """Checkpoint action rows as plain dicts. PYARROW-first (r8): a
    driver-side columnar read with no Spark job — replaying a 10k-add
    checkpoint costs ~30 ms instead of the ~400 ms JVM
    collect()-and-convert round trip. (Since r9 the PLANNING path
    doesn't even pay the dict materialization — ``_replay(lazy=True)``
    keeps adds columnar via ``delta_columnar``; this function remains
    the exact path for writers/CDF/DV replays and the fallback.)
    Falls back to the Spark reader on any parse surprise (foreign
    multi-part layouts, exotic logical types) — correctness never
    depends on the fast path."""
    if len(cp_files) == 1 and delta_columnar.is_v2_top(cp_files[0]):
        yield from _v2_checkpoint_rows(cp_files[0])
        return
    rows = None
    try:
        import pyarrow.parquet as pq

        rows = []  # materialize fully BEFORE yielding: a mid-stream
        for f in cp_files:  # failure must not double-apply actions
            tbl = pq.read_table(f)
            paths = delta_columnar.schema_map_paths(tbl.schema)
            for raw in tbl.to_pylist():
                rows.append(delta_columnar.convert_maps(raw, paths))
    except Exception:
        rows = None
    if rows is not None:
        yield from rows
        return
    for row in spark.read.parquet(*cp_files).collect():
        yield row.asDict(recursive=True)


def _norm_schema_json(o: Any, key: str | None = None) -> Any:
    """Delta's schemaString spells the NTZ type ``timestampNtz``;
    Spark's ``StructType.fromJson`` only accepts ``timestamp_ntz`` —
    normalize recursively (type positions only, never field names)."""
    if isinstance(o, dict):
        return {k: _norm_schema_json(v, k) for k, v in o.items()}
    if isinstance(o, list):
        return [_norm_schema_json(x, key) for x in o]
    if o == "timestampNtz" and key in (
        "type", "elementType", "keyType", "valueType"
    ):
        return "timestamp_ntz"
    return o


def schema_from_json(schema_json: str | dict) -> T.StructType:
    """Delta schemaString (text or parsed) → Spark StructType, with
    the protocol's type spellings normalized. EVERY schemaString parse
    must come through here — a raw ``StructType.fromJson`` crashes on
    any table with a TIMESTAMP_NTZ column."""
    obj = (
        json.loads(schema_json) if isinstance(schema_json, str)
        else schema_json
    )
    return T.StructType.fromJson(_norm_schema_json(obj))


def _mapping(meta: dict[str, Any]) -> tuple[str, dict[str, str]]:
    """(column-mapping mode, {logical name: physical name}).

    Both mapping modes read each field's
    ``delta.columnMapping.physicalName`` from the schemaString
    metadata (the spec requires it whenever mapping is enabled —
    partition values and the Hive layout are keyed by physical name
    in either mode). What differs is how DATA FILE columns match:
    ``name`` mode by physical name; ``id`` mode by the parquet field
    id stamped from ``delta.columnMapping.id`` (``_mapping_ids`` +
    Spark's field-id resolution in ``read_delta``).
    """
    conf = meta.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    if mode not in ("none", "name", "id"):
        raise NotImplementedError(
            f"Delta column mapping mode {mode!r}: 'none', 'name' and "
            "'id' are supported by this reader"
        )
    phys: dict[str, str] = {}
    if mode in ("name", "id"):
        sc = json.loads(meta["schemaString"])
        for f in sc["fields"]:
            md = f.get("metadata") or {}
            phys[f["name"]] = md.get(
                "delta.columnMapping.physicalName", f["name"]
            )
    return mode, phys


def _mapping_ids(meta: dict[str, Any]) -> dict[str, int]:
    """{logical name: delta.columnMapping.id} — the field ids an
    ``id``-mode scan matches data-file columns by."""
    sc = json.loads(meta["schemaString"])
    out: dict[str, int] = {}
    for f in sc["fields"]:
        md = f.get("metadata") or {}
        if "delta.columnMapping.id" not in md:
            raise ValueError(
                f"column-mapping mode 'id' but field {f['name']!r} "
                "carries no delta.columnMapping.id"
            )
        out[f["name"]] = int(md["delta.columnMapping.id"])
    return out


def _files_have_field_ids(paths, sample: int = 16) -> bool:
    """True iff the (sampled) data files embed parquet field ids —
    the precondition for id-based matching; an id-mode read over
    id-less files would otherwise silently return nulls."""
    import pyarrow.parquet as pq

    for p in list(paths)[:sample]:
        sch = pq.ParquetFile(p).schema_arrow
        for field in sch:
            if b"PARQUET:field_id" not in (field.metadata or {}):
                return False
    return True


def _partition_cols(
    meta: dict[str, Any], schema: T.StructType, phys: dict[str, str]
) -> list[str]:
    """metaData.partitionColumns resolved to LOGICAL names (real Delta
    stores physical names there once column mapping is on; this writer
    stores logical — accept both)."""
    logical = {f.name for f in schema.fields}
    rev = {p: l for l, p in phys.items()}
    out = []
    for c in meta.get("partitionColumns") or []:
        if c in logical:
            out.append(c)
        elif c in rev:
            out.append(rev[c])
        else:
            raise ValueError(
                f"partition column {c!r} not in table schema "
                f"{sorted(logical)}"
            )
    return out


def _pv(add: dict[str, Any], part_cols: list[str],
        phys: dict[str, str]) -> dict[str, str | None]:
    """One add action's partition values keyed by LOGICAL name
    (partitionValues keys are physical names under column mapping)."""
    raw = add.get("partitionValues") or {}
    return {
        c: raw.get(phys.get(c, c), raw.get(c)) for c in part_cols
    }


def _pv_str(v: Any) -> str | None:
    """Python value → Delta's string partition-value representation."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
            else v.isoformat()
    return str(v)


def _stats_literal(v: Any) -> Any:
    """A predicate literal in the representation the stats JSON uses
    (ISO strings for dates/timestamps — lexicographic == chronologic
    in that format)."""
    if isinstance(v, datetime.datetime):
        # Same naive-UTC normalization as the writer's _jsonable: a
        # tz-aware literal must compare against the naive-UTC strings
        # the stats JSON stores.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _stats_keep(
    add: dict[str, Any], predicates: list[tuple],
    phys: dict[str, str] | None = None,
) -> bool:
    """DATA SKIPPING: False iff the add action's footer-derived
    ``stats`` bounds PROVE no row can satisfy every predicate.
    Missing stats / missing column bounds / type mismatches keep the
    file — skipping may only ever be a superset of the true match
    set (the residual row filter stays exact). ``phys`` translates
    logical predicate columns to the PHYSICAL names stats are keyed
    by under column mapping."""
    raw = add.get("stats")
    if not raw:
        return True
    try:
        s = json.loads(raw) if isinstance(raw, str) else raw
    except (TypeError, ValueError):
        return True
    mins = s.get("minValues") or {}
    maxs = s.get("maxValues") or {}
    for col, op, lit in predicates:
        if phys:
            col = phys.get(col, col)
        lo, hi = mins.get(col), maxs.get(col)
        if lo is None or hi is None:
            continue
        try:
            if op == "in":
                vals = [_stats_literal(x) for x in lit]
                if not any(lo <= x <= hi for x in vals):
                    return False
                continue
            x = _stats_literal(lit)
            if op in ("==", "=") and not (lo <= x <= hi):
                return False
            if op == ">=" and not (hi >= x):
                return False
            if op == ">" and not (hi > x):
                return False
            if op == "<=" and not (lo <= x):
                return False
            if op == "<" and not (lo < x):
                return False
        except TypeError:
            continue  # incomparable representations: keep
    return True


def _pv_pass(
    pv: dict[str, str | None], flt: PartitionFilter
) -> bool:
    if callable(flt):
        return bool(flt(dict(pv)))
    for col, want in flt.items():
        if col not in pv:
            raise ValueError(f"partition_filter column {col!r} is not a "
                             f"partition column ({sorted(pv)})")
        wants = want if isinstance(want, (list, tuple, set)) else [want]
        if pv[col] not in {_pv_str(w) for w in wants}:
            return False
    return True


def _hive_consistent(
    files: dict[str, Any], part_cols: list[str], phys: dict[str, str]
) -> bool:
    """True iff every active file's relative path is exactly
    ``p1=v1/…/pn=vn/<file>`` AND the encoded values agree with its
    logged partitionValues — the precondition for the single-scan
    ``basePath`` read (a mismatch would let directory names override
    the log, so we verify rather than assume)."""
    for rel, a in files.items():
        if os.path.isabs(rel):
            return False
        segs = rel.split("/")
        if len(segs) != len(part_cols) + 1:
            return False
        pv = _pv(a, part_cols, phys)
        for c, seg in zip(part_cols, segs):
            k, eq, v = seg.partition("=")
            if not eq or unquote(k) != phys.get(c, c):
                return False
            val = None if v == _HIVE_NULL else unquote(v)
            if val != pv[c] and not (val == "" and pv[c] is None):
                return False
    return True


def _abs_hive_root(
    files: dict[str, Any], part_cols: list[str], phys: dict[str, str]
) -> str | None:
    """For an ALL-ABSOLUTE-paths active set (a SHALLOW CLONE of a
    partitioned source), the single directory under which every path
    is exactly ``p1=v1/…/pn=vn/<file>`` with values agreeing with the
    logged partitionValues — the clone's ``basePath`` for the ONE-scan
    partitioned read. None when no such root exists (mixed roots, or
    the clone has its own relative rewrites next to shared absolute
    files — those fall to the per-group union)."""
    root: str | None = None
    for rel, a in files.items():
        if not os.path.isabs(rel):
            return None
        segs = rel.split("/")
        if len(segs) < len(part_cols) + 2:
            return None
        head = "/".join(segs[: -(len(part_cols) + 1)])
        if root is None:
            root = head
        elif root != head:
            return None
        pv = _pv(a, part_cols, phys)
        for c, seg in zip(part_cols, segs[-(len(part_cols) + 1):-1]):
            k, eq, v = seg.partition("=")
            if not eq or unquote(k) != phys.get(c, c):
                return None
            val = None if v == _HIVE_NULL else unquote(v)
            if val != pv[c] and not (val == "" and pv[c] is None):
                return None
    return root


def _dict_prune(
    files: dict[str, Any],
    part_cols: list[str],
    phys: dict[str, str],
    keep_pv: Callable[[dict], bool] | None,
    predicates: list[tuple] | None,
) -> dict[str, Any]:
    """The exact per-add pruning loop: partition predicate (generated
    columns + explicit filters) then per-add footer-stats data
    skipping (real Delta's second pruning tier; composes with ZORDER,
    which tightens per-file spans)."""
    if keep_pv is not None:
        files = {
            rel: a for rel, a in files.items()
            if keep_pv(_pv(a, part_cols, phys))
        }
    if predicates:
        files = {
            rel: a for rel, a in files.items()
            if _stats_keep(a, list(predicates), phys)
        }
    return files


def _pruned_files(
    state: dict[str, Any],
    schema: T.StructType,
    part_cols: list[str],
    phys: dict[str, str],
    keep_pv: Callable[[dict], bool] | None,
    predicates: list[tuple] | None,
) -> dict[str, Any]:
    """Resolve a (possibly lazy) replay state to the pruned add-dict
    file list. Columnar batches are mask-pruned with Arrow compute and
    only KEPT rows pay dict materialization (the r9 fix for the
    ~30 µs/add planning cost PLANTIME measured at 10k adds — ~30 s of
    driver time per query at a 100 TB table's ~1M adds); any batch the
    columnar path can't prune exactly drops the whole resolution to
    the classic dict loop, so the two paths always yield the same
    files (pinned by tests/test_delta_columnar.py)."""
    batches = state.get("batches") or []
    if not batches:
        return _dict_prune(
            dict(state["files"]), part_cols, phys, keep_pv, predicates
        )
    out: dict[str, Any] = {}
    ok = True
    for b in batches:
        kept = delta_columnar.prune_adds(
            b["tbl"], b["dropped"], part_cols, phys, keep_pv,
            predicates, schema, _stats_literal,
        )
        if kept is None:
            ok = False
            break
        for d in delta_columnar.materialize_adds(kept):
            out[d["path"]] = d
    if ok:
        out.update(
            _dict_prune(
                dict(state["files"]), part_cols, phys, keep_pv,
                predicates,
            )
        )
        return out
    # exact fallback: materialize every live batch row, prune as dicts
    full: dict[str, Any] = {}
    for b in batches:
        kept = delta_columnar.prune_adds(
            b["tbl"], b["dropped"], part_cols, phys, None, None,
            schema, _stats_literal,
        )
        rows = (
            delta_columnar.materialize_adds(kept)
            if kept is not None
            else [
                d for d in delta_columnar.materialize_adds(b["tbl"])
                if d["path"] not in b["dropped"]
            ]
        )
        for d in rows:
            full[d["path"]] = d
    full.update(state["files"])
    return _dict_prune(full, part_cols, phys, keep_pv, predicates)


def version_at_timestamp(path: str, ts_millis: int) -> int:
    """``timestampAsOf`` resolution per the Delta contract: the latest
    version whose commit timestamp is <= the requested time (raises if
    the table's first commit is later). Commits carrying an
    ``inCommitTimestamp`` (the ``inCommitTimestamp`` writer feature,
    ``delta_writer.enable_in_commit_timestamps``) resolve by THAT —
    strictly monotonic and stored in the commit content, immune to
    file-mtime rewrites and writer clock skew; legacy commits keep the
    commitInfo wall-clock stamp with the mtime fallback."""
    best = None
    for v, f in _commit_files(path):
        info_ts = None
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    d = json.loads(line)
                    if "commitInfo" in d:
                        ci = d["commitInfo"]
                        info_ts = ci.get(
                            "inCommitTimestamp", ci.get("timestamp")
                        )
        if info_ts is None:
            info_ts = int(os.path.getmtime(f) * 1000)  # spec fallback
        if info_ts <= ts_millis:
            best = v
    if best is None:
        raise ValueError(
            f"no commit at or before timestamp {ts_millis} in {path}"
        )
    return best


def plan_file_list(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: int | datetime.datetime | None = None,
    partition_filter: PartitionFilter | None = None,
    predicates: list[tuple] | None = None,
) -> dict:
    """PLANNING ONLY: replay the log and prune the active add set —
    generated-column partition pruning, per-add stats data skipping,
    explicit partition filters — returning the state ``read_delta``
    scans WITHOUT building a DataFrame or touching any data file.
    ``bench.py``'s PLANTIME tracker times exactly this function, so a
    regression in the pure-Python metadata walk (log replay cost per
    commit, pruning cost per add) is visible per round as a function
    of file/commit count."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        if isinstance(timestamp, datetime.datetime):
            timestamp = int(timestamp.timestamp() * 1000)
        version = version_at_timestamp(path, int(timestamp))
    state = _replay(
        spark, path, version, lazy=True,
        # nothing to prune → the Arrow JSON-tail parse is pure
        # overhead; checkpoint stays columnar either way
        lazy_tail=bool(predicates) or partition_filter is not None,
    )
    meta = state["metaData"]
    schema = schema_from_json(meta["schemaString"])
    mode, phys = _mapping(meta)
    part_cols = _partition_cols(meta, schema, phys)
    residual = None
    gen_pred = None
    if predicates:
        from dst_spark_k8_lakehouse_spark.plans import (
            delta_generated,
            iceberg_transforms as _tr,
        )

        known = {f.name for f in schema.fields}
        unknown = sorted({c for c, _o, _v in predicates} - known)
        if unknown:
            raise ValueError(
                f"predicate column(s) {unknown} not in schema "
                f"{sorted(known)}"
            )
        gen_pred = delta_generated.partition_predicate(
            meta, list(predicates)
        )
        residual = _tr.predicates_to_column(list(predicates))
    if partition_filter is not None and not part_cols:
        raise ValueError("partition_filter on an unpartitioned table")
    keep_pv = None
    if gen_pred is not None or partition_filter is not None:
        def keep_pv(pv, _g=gen_pred, _f=partition_filter):
            if _g is not None and not _g(pv):
                return False
            if _f is not None and not _pv_pass(pv, _f):
                return False
            return True
    files = _pruned_files(
        state, schema, part_cols, phys, keep_pv, predicates
    )
    return {
        "state": state, "metaData": meta, "schema": schema,
        "mode": mode, "phys": phys, "part_cols": part_cols,
        "files": files, "residual": residual,
    }


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: int | datetime.datetime | None = None,
    partition_filter: PartitionFilter | None = None,
    with_row_identity: bool = False,
    predicates: list[tuple] | None = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """SELECT from a Delta table directory (optionally ``versionAsOf``
    = ``version`` or ``timestampAsOf`` = ``timestamp``, epoch millis
    or datetime) without the Delta runtime. Partition columns come
    from the log's ``partitionValues``; ``partition_filter`` prunes
    the file list driver-side before the scan exists. An empty active
    set returns an empty frame with the table schema. Deletion-vector
    rows are subtracted (``_dv_row_filter``).
    ``with_row_identity=True`` additionally exposes each row's
    ``ROW_FILE``/``ROW_POS`` physical identity (post-DV-subtraction —
    what ``delta_dv.delete_where_dv`` builds its bitmaps from).

    ``predicates`` (``[(source_col, op, literal)]``, op in
    ``== < <= > >= in``) is the GENERATED-COLUMN pruning surface
    (``plans/delta_generated``): predicates on a generation
    expression's SOURCE column prune partition files through the
    recognized expression shapes (a ``ts`` range on a
    ``d = CAST(ts AS DATE)``-partitioned table reads only the
    matching days' files — the jar's OptimizeGeneratedColumn rule)
    AND apply as the residual row filter, so the result is exact
    whether or not anything pruned."""
    plan = plan_file_list(
        spark, path, version=version, timestamp=timestamp,
        partition_filter=partition_filter, predicates=predicates,
    )
    meta = plan["metaData"]
    schema = plan["schema"]
    mode, phys = plan["mode"], plan["phys"]
    part_cols = plan["part_cols"]
    files = plan["files"]
    residual = plan["residual"]
    need_id = with_row_identity or with_row_ids or any(
        a.get("deletionVector") for a in files.values()
    )
    # the row-tracking materialized id column is HIDDEN from ordinary
    # reads (``with_row_ids`` resolves it into ``_row_id`` instead)
    mat_col = (meta.get("configuration") or {}).get(
        "delta.rowTracking.materializedRowIdColumnName"
    )

    def _finish(df: DataFrame) -> DataFrame:
        if need_id:
            df = _dv_row_filter(
                spark, _add_row_identity(df), path, files
            )
            if with_row_ids:
                from dst_spark_k8_lakehouse_spark.plans import (
                    delta_rowtracking,
                )

                df = delta_rowtracking.attach_row_ids(
                    spark, df, path, files, meta
                )
            if not with_row_identity:
                df = df.drop(ROW_FILE, ROW_POS)
        if mat_col and mat_col in df.columns:
            df = df.drop(mat_col)
        if residual is not None:
            # the predicates' exact row filter — pruning is a superset
            df = df.where(residual)
        return df

    if not files:
        vis = [f for f in schema.fields if f.name != mat_col]
        empty = spark.createDataFrame([], T.StructType(vis))
        if with_row_identity:
            empty = empty.withColumn(
                ROW_FILE, F.lit(None).cast("string")
            ).withColumn(ROW_POS, F.lit(None).cast("long"))
        if with_row_ids:
            from dst_spark_k8_lakehouse_spark.plans import (
                delta_rowtracking,
            )

            empty = empty.withColumn(
                delta_rowtracking.ROW_ID, F.lit(None).cast("long")
            )
        return empty
    by_name = {f.name: f for f in schema.fields}
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    id_mode = mode == "id"
    if id_mode:
        # id mode: request LOGICAL names stamped with each column's
        # delta.columnMapping.id; Spark's parquet field-id resolution
        # matches file columns by embedded id regardless of their
        # (physical) names — the same machinery iceberg_reader uses
        ids = _mapping_ids(meta)
        read_fields = [
            T.StructField(
                f.name, f.dataType, f.nullable,
                metadata={"parquet.field.id": ids[f.name]},
            )
            for f in data_fields
        ]
    else:
        read_fields = [
            T.StructField(phys.get(f.name, f.name), f.dataType, f.nullable)
            for f in data_fields
        ]
    abspaths = {
        rel: rel if os.path.isabs(rel) else os.path.join(path, rel)
        for rel in files
    }
    if id_mode:
        if not _files_have_field_ids(abspaths.values()):
            raise NotImplementedError(
                "column-mapping mode 'id' but the data files embed no "
                "parquet field ids — an id-matched read would silently "
                "return nulls"
            )
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        # a file genuinely missing a requested id = column added after
        # the file was written; the spec reads it as null
        spark.conf.set(
            "spark.sql.parquet.fieldId.read.ignoreMissing", "true"
        )
    logical = [
        # id mode: alias with EMPTY metadata to strip the
        # parquet.field.id the read schema carried — a scan-resolution
        # tag that must not ride into downstream plans (a plain
        # parquet write of two joined id-mode tables would embed
        # duplicate ids; writers re-stamp from table metadata)
        F.col(f.name).alias(f.name, metadata={})
        if id_mode and f.name not in part_cols
        else F.col(phys.get(f.name, f.name)).alias(f.name)
        for f in schema.fields
    ]
    if not part_cols:
        df = spark.read.schema(T.StructType(read_fields)).parquet(
            *abspaths.values()
        )
        return _finish(df.select(*logical))
    base_path = (
        path if _hive_consistent(files, part_cols, phys)
        # a SHALLOW CLONE of a partitioned source: every add is an
        # absolute path under the SOURCE's hive layout — anchor the
        # one-scan read there instead of degrading to the per-group
        # union (whose plan grows with partition count)
        else _abs_hive_root(files, part_cols, phys)
    )
    if base_path is not None:
        # ONE scan for any partition count: basePath partition
        # discovery over the explicit (pruned) file list, partition
        # column types taken from the user schema
        full = T.StructType(
            read_fields
            + [
                T.StructField(phys.get(c, c), by_name[c].dataType, True)
                for c in part_cols
            ]
        )
        df = (
            spark.read.option("basePath", base_path)
            .schema(full)
            .parquet(*abspaths.values())
        )
        return _finish(df.select(*logical))
    # fallback: group files by partition values, inject literals per
    # group (plan grows with group count — acceptable only off the
    # standard layout)
    if with_row_ids:
        raise NotImplementedError(
            "row-id reads on a nonstandard partition layout"
        )
    groups: dict[tuple, list[tuple[str, str]]] = {}
    for rel, a in files.items():
        pv = _pv(a, part_cols, phys)
        key = tuple(pv[c] for c in part_cols)
        groups.setdefault(key, []).append((abspaths[rel], rel))
    parts: list[DataFrame] = []
    for key, group in groups.items():
        paths = [absp for absp, _rel in group]
        df = spark.read.schema(T.StructType(read_fields)).parquet(*paths)
        extra: list[str] = []
        if need_id:
            df = _dv_row_filter(
                spark,
                _add_row_identity(df),
                path,
                {rel: files[rel] for _absp, rel in group},
            )
            extra = [ROW_FILE, ROW_POS] if with_row_identity else []
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(by_name[c].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[c].dataType)
            )
            df = df.withColumn(c, lit)
        parts.append(
            df.select(
                *[
                    F.col(phys.get(f.name, f.name)).alias(f.name)
                    if f.name not in part_cols
                    else F.col(f.name)
                    for f in schema.fields
                    if f.name != mat_col
                ],
                *extra,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(residual) if residual is not None else out


def delta_history(path: str) -> list[dict[str, Any]]:
    """Commit metadata per version (from each commit's commitInfo
    action when present), newest first — the read-only analogue of
    DESCRIBE HISTORY."""
    out = []
    for v, f in _commit_files(path):
        info: dict[str, Any] = {"version": v}
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    d = json.loads(line)
                    if "commitInfo" in d:
                        ci = d["commitInfo"]
                        info["operation"] = ci.get("operation")
                        info["timestamp"] = ci.get("timestamp")
        out.append(info)
    return sorted(out, key=lambda x: -x["version"])
