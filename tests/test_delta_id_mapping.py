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


def test_datasource_reads_id_mode(spark, id_table):
    """The ``delta_native`` DataSource id-matches file columns too
    (r7: previously a loud refusal)."""
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    rows = {
        (r.id, r.v)
        for r in spark.read.format("delta_native").load(id_table).collect()
    }
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


# ---------------------------------------------------------------------------
# id-mode WRITES (r7): create/append/rename/add_column through the
# library writer, mirroring the name-mode set in test_delta_evolution


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(lo, hi)],
        "id long, v string, x double",
    )


def _phys_names(table):
    from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr2

    state = dr2._replay(None, table, None)
    sc = json.loads(state["metaData"]["schemaString"])
    return {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in sc["fields"]
    }


def test_create_id_mode_stamps_field_ids(spark, tmp_path):
    import pyarrow.parquet as pq

    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "t")
    dw.create_delta(_mk(spark, 0, 10).coalesce(1), table,
                    column_mapping="id")
    state = dr._replay(spark, table, None)
    conf = state["metaData"]["configuration"]
    assert conf["delta.columnMapping.mode"] == "id"
    assert conf["delta.columnMapping.maxColumnId"] == "3"
    assert state["protocol"]["minReaderVersion"] == 2
    assert state["protocol"]["minWriterVersion"] == 5
    phys = _phys_names(table)
    assert all(p.startswith("col-") for p in phys.values())
    # data files: physical names + embedded field ids
    [rel] = list(state["files"])
    sch = pq.ParquetFile(os.path.join(table, rel)).schema_arrow
    assert set(sch.names) == set(phys.values())
    fids = {
        f.name: int((f.metadata or {})[b"PARQUET:field_id"]) for f in sch
    }
    assert sorted(fids.values()) == [1, 2, 3]
    rows = {(r.id, r.v) for r in dr.read_delta(spark, table).collect()}
    assert rows == {(i, f"v{i}") for i in range(10)}


def test_id_mode_append_and_rename_roundtrip(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "t")
    dw.create_delta(_mk(spark, 0, 5), table, column_mapping="id")
    dw.append_delta(_mk(spark, 5, 10), table)
    # rename is metadata-only: same physical names, same files
    files_before = set(dr._replay(spark, table, None)["files"])
    dw.rename_column(spark, table, "v", "label")
    state = dr._replay(spark, table, None)
    assert set(state["files"]) == files_before
    rows = {
        (r.id, r.label) for r in dr.read_delta(spark, table).collect()
    }
    assert rows == {(i, f"v{i}") for i in range(10)}
    # append AFTER the rename still id-stamps correctly
    df2 = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(10, 12)],
        "id long, label string, x double",
    )
    dw.append_delta(df2, table)
    rows = {
        (r.id, r.label) for r in dr.read_delta(spark, table).collect()
    }
    assert rows == {(i, f"v{i}") for i in range(12)}


def test_id_mode_add_column_and_merge_schema(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "t")
    dw.create_delta(_mk(spark, 0, 5), table, column_mapping="id")
    dw.add_column(spark, table, "w", "double")
    phys = _phys_names(table)
    assert phys["w"].startswith("col-")
    got = dr.read_delta(spark, table)
    assert got.where("w IS NULL").count() == 5
    # mergeSchema append adds another id-mapped column
    df2 = spark.createDataFrame(
        [(100, "z", 1.0, 2.0, True)],
        "id long, v string, x double, w double, flag boolean",
    )
    dw.append_delta(df2, table, merge_schema=True)
    state = dr._replay(spark, table, None)
    conf = state["metaData"]["configuration"]
    assert conf["delta.columnMapping.maxColumnId"] == "5"
    rows = dr.read_delta(spark, table)
    assert rows.count() == 6
    assert rows.where("flag").count() == 1
    assert rows.where("flag IS NULL").count() == 5


def test_id_mode_partitioned_create_and_prune(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", float(i))
         for i in range(20)],
        "id long, par string, x double",
    )
    dw.create_delta(df, table, partition_by=["par"],
                    column_mapping="id")
    phys = _phys_names(table)
    # Hive dirs are keyed by PHYSICAL name
    assert any(
        d.startswith(f"{phys['par']}=") for d in os.listdir(table)
        if not d.startswith("_")
    )
    pruned = dr.read_delta(
        spark, table, partition_filter={"par": "even"}
    )
    assert {r.id % 2 for r in pruned.collect()} == {0}
    assert pruned.count() == 10


def test_id_mode_datasource_write_and_read(spark, tmp_path):
    import pyarrow.parquet as pq

    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    table = str(tmp_path / "t")
    dw.create_delta(_mk(spark, 0, 3), table, column_mapping="id")
    _mk(spark, 3, 6).write.format("delta_native").mode("append").save(
        table
    )
    state = dr._replay(spark, table, None)
    assert len(state["files"]) >= 2
    for rel in state["files"]:
        sch = pq.ParquetFile(os.path.join(table, rel)).schema_arrow
        assert all(
            b"PARQUET:field_id" in (f.metadata or {}) for f in sch
        ), f"{rel} missing field ids"
    for face in (
        dr.read_delta(spark, table),
        spark.read.format("delta_native").load(table),
    ):
        assert {(r.id, r.v) for r in face.collect()} == {
            (i, f"v{i}") for i in range(6)
        }


def test_id_mode_overwrite(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    table = str(tmp_path / "t")
    dw.create_delta(_mk(spark, 0, 5), table, column_mapping="id")
    dw.overwrite_delta(_mk(spark, 100, 103), table)
    rows = {(r.id, r.v) for r in dr.read_delta(spark, table).collect()}
    assert rows == {(i, f"v{i}") for i in range(100, 103)}
    # time travel to the pre-overwrite snapshot still id-resolves
    old = {(r.id, r.v)
           for r in dr.read_delta(spark, table, version=0).collect()}
    assert old == {(i, f"v{i}") for i in range(5)}
