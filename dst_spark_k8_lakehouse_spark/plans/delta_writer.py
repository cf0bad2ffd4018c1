"""Minimal single-writer Delta Lake writer — pure Python over the
PUBLIC Delta commit protocol (no jars).

Completes ``delta_reader``'s half of the story for the simple cases:
``create`` / ``append`` / ``overwrite`` commits whose logs any real
Delta 3.x runtime (or our reader) can consume. Protocol per commit:
write the data files as ordinary parquet, then atomically publish ONE
``_delta_log/{version:020d}.json`` with the actions:

- v0: ``protocol`` (minReader 1 / minWriter 2 — no table features
  needed for plain appends), ``metaData`` (schema as Delta's JSON
  struct, partition columns), ``add`` per file, ``commitInfo``;
- append: ``add`` actions only;
- overwrite: ``remove`` for every live file + ``add`` for the new.

Atomicity/concurrency, stated honestly: Delta's optimistic protocol
needs put-if-absent on the commit file. Local/HDFS rename gives that
(``os.link`` + unlink here: hard-link-as-commit fails with EEXIST if
the version was taken, the documented single-cluster pattern); object
stores need a coordination service (the reason the real writer has a
LogStore abstraction) — so this writer declares SINGLE-WRITER use.
A lost race raises ``FileExistsError`` and the commit can be retried
at the next version; data files are uniquely named so an abandoned
attempt leaves garbage, never corruption.

Type mapping covers the engine's scalar surface (long/int/double/
float/string/boolean/date/timestamp/decimal/binary + arrays); an
unmapped type raises rather than writing a schemaString real Delta
would reject.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dst_spark_k8_lakehouse_spark.plans import delta_reader


def _delta_type(dt: T.DataType) -> Any:
    simple = {
        T.LongType: "long", T.IntegerType: "integer",
        T.ShortType: "short", T.ByteType: "byte",
        T.DoubleType: "double", T.FloatType: "float",
        T.StringType: "string", T.BooleanType: "boolean",
        T.DateType: "date", T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestampNtz", T.BinaryType: "binary",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "elementType": _delta_type(dt.elementType),
            "containsNull": dt.containsNull,
        }
    raise NotImplementedError(f"no Delta schema mapping for {dt}")


def _schema_string(schema: T.StructType) -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": f.name,
                    "type": _delta_type(f.dataType),
                    "nullable": f.nullable,
                    "metadata": {},
                }
                for f in schema.fields
            ],
        }
    )


def _write_data_files(df: DataFrame, table: str) -> list[dict[str, Any]]:
    """Write df as parquet files directly under the table dir with
    unique names; return their add actions."""
    staging = os.path.join(table, f"_staging-{uuid.uuid4().hex}")
    df.write.parquet(staging)
    adds = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        src = os.path.join(staging, f)
        dst = os.path.join(table, name)
        os.replace(src, dst)
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": os.path.getsize(dst),
                    "modificationTime": int(time.time() * 1000),
                    "dataChange": True,
                }
            }
        )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return adds


def _commit(table: str, version: int, actions: list[dict[str, Any]]) -> None:
    """Put-if-absent publish of the commit file (hard-link pattern)."""
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, f".{uuid.uuid4().hex}.json.tmp")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    final = os.path.join(log, f"{version:020d}.json")
    try:
        os.link(tmp, final)  # EEXIST on a lost race — never overwrite
    finally:
        os.unlink(tmp)


def _next_version(table: str) -> int:
    """Max of the last JSON commit and the last checkpoint, plus one —
    a log whose pre-checkpoint JSON commits were cleaned up must not
    reuse a version at or below the checkpoint (the reader replays
    from the checkpoint and would never see it)."""
    commits = delta_reader._commit_files(table)
    last = commits[-1][0] if commits else -1
    cp = delta_reader._checkpoint(table)
    if cp is not None:
        last = max(last, cp[0])
    return last + 1


def _commit_info(operation: str) -> dict[str, Any]:
    return {
        "commitInfo": {
            "operation": operation,
            "timestamp": int(time.time() * 1000),
            "engineInfo": "dst-spark-k8-lakehouse-spark pure-python writer",
        }
    }


def create_delta(df: DataFrame, table: str) -> None:
    """CREATE: version-0 commit (protocol + metaData + adds)."""
    if delta_reader.is_delta_table(table):
        raise ValueError(f"Delta table already exists at {table}")
    os.makedirs(table, exist_ok=True)
    actions: list[dict[str, Any]] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(df.schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    actions += _write_data_files(df, table)
    actions.append(_commit_info("CREATE TABLE AS SELECT"))
    _commit(table, 0, actions)


def append_delta(df: DataFrame, table: str) -> None:
    """APPEND: adds only; schema must match the table's metaData."""
    state = delta_reader._replay(df.sparkSession, table, None)
    expected = T.StructType.fromJson(
        json.loads(state["metaData"]["schemaString"])
    )
    if [f.name for f in expected.fields] != df.columns:
        raise ValueError(
            f"append schema {df.columns} != table schema "
            f"{[f.name for f in expected.fields]}"
        )
    actions = _write_data_files(df, table)
    actions.append(_commit_info("WRITE"))
    _commit(table, _next_version(table), actions)


_CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField(
            "protocol",
            T.StructType(
                [
                    T.StructField("minReaderVersion", T.IntegerType()),
                    T.StructField("minWriterVersion", T.IntegerType()),
                ]
            ),
        ),
        T.StructField(
            "metaData",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField(
                        "format",
                        T.StructType(
                            [
                                T.StructField("provider", T.StringType()),
                                T.StructField(
                                    "options",
                                    T.MapType(T.StringType(), T.StringType()),
                                ),
                            ]
                        ),
                    ),
                    T.StructField("schemaString", T.StringType()),
                    T.StructField(
                        "partitionColumns", T.ArrayType(T.StringType())
                    ),
                    T.StructField(
                        "configuration",
                        T.MapType(T.StringType(), T.StringType()),
                    ),
                    T.StructField("createdTime", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "add",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField(
                        "partitionValues",
                        T.MapType(T.StringType(), T.StringType()),
                    ),
                    T.StructField("size", T.LongType()),
                    T.StructField("modificationTime", T.LongType()),
                    T.StructField("dataChange", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "remove",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("deletionTimestamp", T.LongType()),
                    T.StructField("dataChange", T.BooleanType()),
                ]
            ),
        ),
    ]
)


def write_checkpoint(spark: SparkSession, table: str) -> int:
    """Write a classic single-file parquet checkpoint of the CURRENT
    log state (protocol + metaData + one reconstructed ``add`` per
    live file, ``dataChange: false`` per the spec) and point
    ``_last_checkpoint`` at it. Readers — ours and real Delta — then
    replay from the checkpoint instead of every JSON commit: the move
    that keeps log replay O(live files), not O(history), on a table
    taking thousands of commits. Returns the checkpointed version."""
    state = delta_reader._replay(spark, table, None)
    commits = delta_reader._commit_files(table)
    if not commits:
        raise ValueError(f"nothing to checkpoint at {table}")
    version = commits[-1][0]
    proto = state.get("protocol") or {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    md = state["metaData"]
    rows: list[tuple] = [
        (
            (proto["minReaderVersion"], proto["minWriterVersion"]),
            None,
            None,
            None,
        ),
        (
            None,
            (
                md.get("id"),
                md.get("name"),
                md.get("description"),
                (
                    (md.get("format") or {}).get("provider", "parquet"),
                    (md.get("format") or {}).get("options") or {},
                ),
                md["schemaString"],
                md.get("partitionColumns") or [],
                md.get("configuration") or {},
                md.get("createdTime"),
            ),
            None,
            None,
        ),
    ]
    for path, a in sorted(state["files"].items()):
        rows.append(
            (
                None,
                None,
                (
                    path,
                    a.get("partitionValues") or {},
                    int(a["size"]),
                    int(a.get("modificationTime") or 0),
                    False,  # spec: checkpoint adds carry dataChange=false
                ),
                None,
            )
        )
    log = os.path.join(table, "_delta_log")
    staging = os.path.join(log, f".cp-{uuid.uuid4().hex}")
    spark.createDataFrame(rows, _CHECKPOINT_SCHEMA).coalesce(1) \
        .write.parquet(staging)
    part = next(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    final = os.path.join(log, f"{version:020d}.checkpoint.parquet")
    os.replace(os.path.join(staging, part), final)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    tmp = os.path.join(log, f".lc-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    os.replace(tmp, os.path.join(log, "_last_checkpoint"))
    return version


def overwrite_delta(df: DataFrame, table: str) -> None:
    """OVERWRITE: remove every live file, add the new set, one commit."""
    state = delta_reader._replay(df.sparkSession, table, None)
    now = int(time.time() * 1000)
    actions: list[dict[str, Any]] = [
        {
            "remove": {
                "path": p,
                "deletionTimestamp": now,
                "dataChange": True,
            }
        }
        for p in state["files"]
    ]
    actions += _write_data_files(df, table)
    actions.append(_commit_info("WRITE"))
    _commit(table, _next_version(table), actions)
