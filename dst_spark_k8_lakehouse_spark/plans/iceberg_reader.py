"""Read-only Apache Iceberg table reader — pure metadata replay over
the PUBLIC Iceberg table spec (no Iceberg runtime jar).

The counterpart of ``delta_reader`` for the reference's other table
format (Iceberg 1.9, ``scripts/download-jars.sh:84-85``,
``02_iceberg_demo.ipynb``): a jar-less session can SELECT from an
EXISTING Iceberg table — including time travel by snapshot id — by
walking the documented metadata chain:

  ``metadata/v*.metadata.json`` (+ ``version-hint.text``)
    → snapshot → ``manifest-list`` (Avro)
    → manifests (Avro) → live data files (parquet) → one scan.

Avro manifests are read through the JVM Avro library ALREADY BUNDLED
with pyspark (``jars/avro-1.12.1.jar``) via py4j generic records —
field access by name, no JSON round-trip, no pip install. Manifest
walking is driver-side metadata work (exactly where Iceberg's own
reader does it); the data read is an ordinary parquet scan with
pushdown.

LOUD limits (raise, never wrong rows): format-version > 2; v2
row-level deletes (a manifest-list entry with content != 0 — merge-
on-read tables need the runtime); schema evolution that renamed
columns (data read trusts the parquet column names — Iceberg's
field-id remapping needs the runtime; the CURRENT schema's names are
cross-checked against the scan and a mismatch raises).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _strip_uri(p: str) -> str:
    return re.sub(r"^file:(//)?", "", p)


def _metadata_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def is_iceberg_table(path: str) -> bool:
    d = _metadata_dir(path)
    return os.path.isdir(d) and any(
        f.endswith(".metadata.json") for f in os.listdir(d)
    )


def _current_metadata_file(path: str) -> str:
    d = _metadata_dir(path)
    hint = os.path.join(d, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = os.path.join(d, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    versions = []
    for f in os.listdir(d):
        m = re.match(r"v(\d+)\.metadata\.json$", f)
        if m:
            versions.append((int(m.group(1)), os.path.join(d, f)))
    if not versions:
        raise ValueError(f"no Iceberg metadata at {path}")
    return max(versions)[1]


def _avro_records(spark: SparkSession, path: str):
    """Yield Java GenericRecords from an Avro file (bundled JVM avro)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(_strip_uri(path)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    try:
        while reader.hasNext():
            yield reader.next()
    finally:
        reader.close()


def _get(rec, name: str):
    """Null-safe field access on a GenericRecord: Avro's ``get`` RAISES
    on a field absent from the writer schema (e.g. ``content`` in a
    genuine v1 manifest list), unlike a dict."""
    return rec.get(name) if rec.getSchema().getField(name) else None


def _live_data_files(
    spark: SparkSession, table_path: str, snapshot: dict[str, Any]
) -> list[str]:
    files: list[str] = []
    for mf in _avro_records(spark, snapshot["manifest-list"]):
        content = _get(mf, "content")
        if content is not None and int(str(content)) != 0:
            raise NotImplementedError(
                "Iceberg v2 delete manifests (merge-on-read) need the "
                "Iceberg runtime; this reader handles copy-on-write "
                "tables only"
            )
        manifest_path = _strip_uri(str(mf.get("manifest_path")))
        for entry in _avro_records(spark, manifest_path):
            status = int(str(entry.get("status")))
            if status == 2:  # DELETED
                continue
            data_file = entry.get("data_file")
            fmt = str(data_file.get("file_format")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"Iceberg data file format {fmt}; parquet only"
                )
            files.append(_strip_uri(str(data_file.get("file_path"))))
    return files


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """SELECT from an Iceberg table directory, optionally time-
    travelling to ``snapshot_id``. Current-schema column names are
    cross-checked against the resolved scan (renamed-column tables
    need the runtime's field-id mapping and raise here)."""
    with open(_current_metadata_file(path)) as fh:
        meta = json.load(fh)
    if int(meta.get("format-version", 1)) > 2:
        raise NotImplementedError(
            f"Iceberg format-version {meta['format-version']} > 2"
        )
    snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
    if snapshot_id is None:
        snapshot_id = int(meta["current-snapshot-id"])
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in table (has "
            f"{sorted(snaps)[:5]}…)"
        )
    files = _live_data_files(spark, path, snaps[snapshot_id])
    schema = None
    for s in meta.get("schemas", []):
        if s.get("schema-id") == meta.get("current-schema-id"):
            schema = s
    if schema is None:
        schema = meta.get("schema")  # v1 single-schema layout
    if not files:
        names = [f["name"] for f in (schema or {}).get("fields", [])]
        return spark.createDataFrame(
            [], "STRUCT<" + ", ".join(f"{n}: STRING" for n in names) + ">"
        ) if names else spark.createDataFrame([], "STRUCT<>")
    df = spark.read.parquet(*files)
    if schema is not None:
        expected = [f["name"] for f in schema["fields"]]
        missing = set(expected) - set(df.columns)
        if missing:
            raise NotImplementedError(
                "current Iceberg schema names "
                f"{sorted(missing)} absent from the data files — "
                "renamed columns need the runtime's field-id mapping"
            )
        df = df.select(*expected)
    return df


def iceberg_snapshots(path: str) -> list[dict[str, Any]]:
    """Snapshot metadata, newest first — the read-only analogue of the
    ``.snapshots`` metadata table."""
    with open(_current_metadata_file(path)) as fh:
        meta = json.load(fh)
    out = [
        {
            "snapshot_id": int(s["snapshot-id"]),
            "timestamp_ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
        }
        for s in meta.get("snapshots", [])
    ]
    return sorted(out, key=lambda x: -(x["timestamp_ms"] or 0))
