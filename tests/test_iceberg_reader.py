"""Read-only Iceberg reader vs hand-built spec-conformant metadata.

No Iceberg runtime exists in this container, so the fixtures build
the documented metadata chain by hand — metadata JSON per the table
spec, manifest list + manifests as real Avro files written through
the SAME bundled JVM Avro library the reader uses."""

from __future__ import annotations

import json
import os

import pytest

from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir

MANIFEST_LIST_SCHEMA = """{"type":"record","name":"manifest_file","fields":[
 {"name":"manifest_path","type":"string"},
 {"name":"manifest_length","type":"long"},
 {"name":"content","type":["null","int"],"default":null}]}"""

MANIFEST_SCHEMA = """{"type":"record","name":"manifest_entry","fields":[
 {"name":"status","type":"int"},
 {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
   {"name":"file_path","type":"string"},
   {"name":"file_format","type":"string"},
   {"name":"record_count","type":"long"}]}}]}"""


def _write_avro(spark, path, schema_json, rows):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    for row in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for k, v in row.items():
            if isinstance(v, dict):
                sub_schema = schema.getField(k).schema()
                sub = jvm.org.apache.avro.generic.GenericData.Record(
                    sub_schema
                )
                for sk, sv in v.items():
                    sub.put(sk, sv)
                rec.put(k, sub)
            else:
                rec.put(k, v)
        writer.append(rec)
    writer.close()


def _schema_meta():
    return {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }


@pytest.fixture()
def iceberg_table(spark, tmp_path):
    table = str(tmp_path / "itab")
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)

    def data_file(name, rows):
        df = spark.createDataFrame(rows, "id long, v string")
        tmp = os.path.join(table, "_t")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(data, name)
        os.replace(os.path.join(tmp, src), dst)
        import shutil

        shutil.rmtree(tmp)
        return dst

    f1 = data_file("f1.parquet", [(1, "a"), (2, "b")])
    f2 = data_file("f2.parquet", [(3, "c")])

    # snapshot 100: f1 added; snapshot 200: f2 added, f1 still live
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, MANIFEST_SCHEMA, [
        {"status": 1, "data_file": {"file_path": f1,
                                    "file_format": "PARQUET",
                                    "record_count": 2}}])
    ml1 = os.path.join(md, "snap-100.avro")
    _write_avro(spark, ml1, MANIFEST_LIST_SCHEMA, [
        {"manifest_path": m1, "manifest_length": 1}])

    m2 = os.path.join(md, "m2.avro")
    _write_avro(spark, m2, MANIFEST_SCHEMA, [
        {"status": 0, "data_file": {"file_path": f1,
                                    "file_format": "PARQUET",
                                    "record_count": 2}},
        {"status": 1, "data_file": {"file_path": f2,
                                    "file_format": "PARQUET",
                                    "record_count": 1}}])
    ml2 = os.path.join(md, "snap-200.avro")
    _write_avro(spark, ml2, MANIFEST_LIST_SCHEMA, [
        {"manifest_path": m2, "manifest_length": 2}])

    meta = {
        "format-version": 2,
        "table-uuid": "t-1",
        "location": table,
        "current-schema-id": 0,
        "schemas": [_schema_meta()],
        "current-snapshot-id": 200,
        "snapshots": [
            {"snapshot-id": 100, "timestamp-ms": 1000,
             "manifest-list": ml1, "summary": {"operation": "append"}},
            {"snapshot-id": 200, "timestamp-ms": 2000,
             "manifest-list": ml2, "summary": {"operation": "append"}},
        ],
    }
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    return table


def test_reads_current_snapshot(spark, iceberg_table):
    assert ir.is_iceberg_table(iceberg_table)
    rows = {(r.id, r.v) for r in ir.read_iceberg(spark, iceberg_table).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_time_travel_by_snapshot(spark, iceberg_table):
    rows = {
        (r.id, r.v)
        for r in ir.read_iceberg(
            spark, iceberg_table, snapshot_id=100
        ).collect()
    }
    assert rows == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="not in table"):
        ir.read_iceberg(spark, iceberg_table, snapshot_id=999)


def test_snapshots_listing(iceberg_table):
    snaps = ir.iceberg_snapshots(iceberg_table)
    assert [s["snapshot_id"] for s in snaps] == [200, 100]
    assert snaps[0]["operation"] == "append"


def test_malformed_delete_manifest_raises(spark, iceberg_table, tmp_path):
    """Delete manifests are READ now (merge-on-read,
    ``test_iceberg_mor.py``) — but a content=1 entry whose file lacks
    the spec's file_path/pos columns must raise, not silently apply
    zero deletes (a schema-forced read would return all nulls)."""
    md = os.path.join(iceberg_table, "metadata")
    ml3 = os.path.join(md, "snap-300.avro")
    _write_avro(spark, ml3, MANIFEST_LIST_SCHEMA, [
        {"manifest_path": os.path.join(md, "m2.avro"),
         "manifest_length": 2},
        # a "delete manifest" whose entries point at ordinary data
        # parquet (no file_path/pos columns)
        {"manifest_path": os.path.join(md, "m1.avro"),
         "manifest_length": 1, "content": 1}])
    with open(os.path.join(md, "v2.metadata.json")) as fh:
        meta = json.load(fh)
    meta["snapshots"].append(
        {"snapshot-id": 300, "timestamp-ms": 3000, "manifest-list": ml3,
         "summary": {"operation": "overwrite"}})
    meta["current-snapshot-id"] = 300
    with open(os.path.join(md, "v3.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("3")
    with pytest.raises(ValueError, match="file_path/pos"):
        ir.read_iceberg(spark, iceberg_table)
