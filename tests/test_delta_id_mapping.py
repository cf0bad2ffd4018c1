"""Delta column-mapping mode 'id': data-file columns are matched by
embedded parquet field id against each schema field's
``delta.columnMapping.id`` — physical names are irrelevant, renames
are metadata-only, and files written before an ADD COLUMN read the
new column as null. Fixtures are hand-built per the protocol (no
Delta runtime in this container)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr


def _field(name, ftype, fid, phys):
    return {
        "name": name,
        "type": ftype,
        "nullable": True,
        "metadata": {
            "delta.columnMapping.id": fid,
            "delta.columnMapping.physicalName": phys,
        },
    }


def _write_commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


@pytest.fixture()
def id_table(spark, tmp_path):
    """Two-column table: logical (id, v), physical (col-aaaa,
    col-bbbb), ids 1 and 2."""
    table = str(tmp_path / "idtab")
    os.makedirs(table)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "`col-aaaa` long, `col-bbbb` string"
    ).select(
        F.col("col-aaaa").alias("col-aaaa",
                                metadata={"parquet.field.id": 1}),
        F.col("col-bbbb").alias("col-bbbb",
                                metadata={"parquet.field.id": 2}),
    )
    tmp = os.path.join(table, "_t")
    df.coalesce(1).write.parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, src), os.path.join(table, "f1.parquet"))
    import shutil

    shutil.rmtree(tmp)
    schema = {
        "type": "struct",
        "fields": [
            _field("id", "long", 1, "col-aaaa"),
            _field("v", "string", 2, "col-bbbb"),
        ],
    }
    _write_commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    return table


def test_id_mode_reads_by_field_id(spark, id_table):
    rows = {
        (r.id, r.v) for r in dr.read_delta(spark, id_table).collect()
    }
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_id_mode_rename_is_metadata_only(spark, id_table):
    """RENAME COLUMN changes only the logical name; the id pins the
    file column."""
    schema = {
        "type": "struct",
        "fields": [
            _field("renamed_id", "long", 1, "col-aaaa"),
            _field("v", "string", 2, "col-bbbb"),
        ],
    }
    _write_commit(id_table, 1, [
        {"metaData": {
            "id": "t-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
    ])
    rows = {
        (r.renamed_id, r.v)
        for r in dr.read_delta(spark, id_table).collect()
    }
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_id_mode_added_column_reads_null(spark, id_table):
    """A column added after f1 was written (id 3, absent from the
    file) reads as null per the spec."""
    schema = {
        "type": "struct",
        "fields": [
            _field("id", "long", 1, "col-aaaa"),
            _field("v", "string", 2, "col-bbbb"),
            _field("w", "double", 3, "col-cccc"),
        ],
    }
    _write_commit(id_table, 1, [
        {"metaData": {
            "id": "t-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
    ])
    rows = {
        (r.id, r.v, r.w)
        for r in dr.read_delta(spark, id_table).collect()
    }
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", None)}


def test_id_mode_idless_files_raise(spark, tmp_path):
    """id mode over files with NO embedded field ids must raise, not
    silently null every column."""
    table = str(tmp_path / "noids")
    os.makedirs(table)
    df = spark.createDataFrame([(1, "a")], "`col-aaaa` long, `col-bbbb` string")
    tmp = os.path.join(table, "_t")
    df.coalesce(1).write.parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, src), os.path.join(table, "f1.parquet"))
    import shutil

    shutil.rmtree(tmp)
    schema = {
        "type": "struct",
        "fields": [
            _field("id", "long", 1, "col-aaaa"),
            _field("v", "string", 2, "col-bbbb"),
        ],
    }
    _write_commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t-2",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(NotImplementedError, match="field ids"):
        dr.read_delta(spark, table).collect()


def test_id_mode_missing_mapping_id_raises(spark, id_table):
    schema = {
        "type": "struct",
        "fields": [
            _field("id", "long", 1, "col-aaaa"),
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {
                 "delta.columnMapping.physicalName": "col-bbbb"
             }},
        ],
    }
    _write_commit(id_table, 1, [
        {"metaData": {
            "id": "t-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
    ])
    with pytest.raises(ValueError, match="delta.columnMapping.id"):
        dr.read_delta(spark, id_table).collect()


def test_datasource_refuses_id_mode(spark, id_table):
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    with pytest.raises(Exception, match="id-mode"):
        spark.read.format("delta_native").load(id_table).collect()
