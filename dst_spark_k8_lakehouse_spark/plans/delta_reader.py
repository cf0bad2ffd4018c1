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
  resolved file list, with Hive-style ``partitionValues`` injected as
  literal columns (Delta stores partition columns in the log, NOT in
  the data files);
- ``version=N`` replays only commits ``<= N`` (a checkpoint above N
  is ignored and the JSON commits replayed from 0 — correctness over
  speed for the time-travel path).

Write paths still raise toward ``VersionedTable`` / the jar-guarded
backend; this module never mutates ``_delta_log``.

Scale note: log replay is driver-side file-list work (the same place
Delta's own Scala reader does it); the data read is an ordinary
parquet scan, so pushdown/pruning behave like any other scan. Reader
feature gaps are LOUD: deletion vectors or column mapping in
``protocol``/``metaData`` raise ``NotImplementedError`` instead of
returning wrong rows.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def is_delta_table(path: str) -> bool:
    """A directory with a ``_delta_log`` containing at least one
    commit or checkpoint is a Delta table."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return False
    return any(
        f.endswith(".json") or f.endswith(".checkpoint.parquet")
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
        files = [
            os.path.join(_log_dir(path), f"{v:020d}.checkpoint.parquet")
        ]
    return v, files


_READER_FEATURES_OK = {"appendOnly", "invariants", "checkConstraints",
                       "timestampNtz", "vacuumProtocolCheck"}


def _apply_action(state: dict[str, Any], action: dict[str, Any]) -> None:
    if "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "add" in action:
        a = action["add"]
        state["files"][a["path"]] = a
    elif "remove" in action:
        state["files"].pop(action["remove"]["path"], None)
    elif "protocol" in action:
        p = action["protocol"]
        feats = set(p.get("readerFeatures") or [])
        if p.get("minReaderVersion", 1) > 3 or (feats - _READER_FEATURES_OK):
            raise NotImplementedError(
                "Delta reader features beyond this reader: "
                f"{sorted(feats - _READER_FEATURES_OK) or p}"
            )
        state["protocol"] = p  # retained so checkpoints can carry it


def _replay(spark: SparkSession, path: str, version: int | None) -> dict:
    state: dict[str, Any] = {"files": {}, "metaData": None, "protocol": None}
    commits = _commit_files(path)
    if not commits and _checkpoint(path) is None:
        raise ValueError(f"no Delta log at {path}")
    start = 0
    cp = _checkpoint(path)
    if cp is not None and (version is None or cp[0] <= version):
        cp_v, cp_files = cp
        for row in spark.read.parquet(*cp_files).collect():
            d = row.asDict(recursive=True)
            for key in ("metaData", "add", "remove", "protocol"):
                if d.get(key) is not None:
                    _apply_action(state, {key: d[key]})
        start = cp_v + 1
    seen_any = start > 0
    for v, f in commits:
        if v < start or (version is not None and v > version):
            continue
        seen_any = True
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))
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


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """SELECT from a Delta table directory (optionally ``versionAsOf``
    = ``version``) without the Delta runtime. Partition columns come
    from the log's ``partitionValues``, cast to the schema's types;
    an empty active set returns an empty frame with the table
    schema."""
    state = _replay(spark, path, version)
    meta = state["metaData"]
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    files = state["files"]
    if not files:
        return spark.createDataFrame([], schema)
    # group files by their partition values so literals inject per group
    groups: dict[tuple, list[str]] = {}
    for relpath, a in files.items():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            relpath
            if os.path.isabs(relpath)
            else os.path.join(path, relpath)
        )
    parts: list[DataFrame] = []
    by_name = {f.name: f for f in schema.fields}
    for key, paths in groups.items():
        df = spark.read.schema(T.StructType(data_fields)).parquet(*paths)
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(by_name[c].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[c].dataType)
            )
            df = df.withColumn(c, lit)
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
