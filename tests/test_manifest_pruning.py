"""MANIFEST-LEVEL pruning from manifest-list partition summaries —
the planning-path twin of the per-file data-skipping tier.

Every native write path stamps the spec's ``partitions`` field
summaries (field-id 507: contains_null + single-value lower/upper
bounds per partition field) onto its manifest-list entries;
``iceberg_reader._snapshot_entries`` evaluates partition predicates
against them and skips whole manifests WITHOUT Avro-decoding them.
These tests instrument the Avro codec and assert pruned manifests are
never OPENED (the manifest-level analogue of the data-file-set
assertions in ``test_iceberg_transforms``), plus the conservative
rules: summary-less manifests (foreign/pre-r8 writers), contains_null
summaries (null source rows / spec-evolution rewrites), and delete
manifests are always decoded.

Reference shape: the demo table ``PARTITIONED BY (days(ts))``
(``/root/reference/docker/spark-notebook/02_iceberg_demo.ipynb:45-54``)
— at 100 TB scale (thousands of manifests) this tier is what keeps
plan time proportional to the queried range, not total metadata bytes.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import (
    avro_codec,
    iceberg_dml,
    iceberg_reader as ir,
    iceberg_writer as iw,
)


@pytest.fixture
def track_avro(monkeypatch):
    """Record every Avro file the reader opens."""
    opened: list[str] = []
    orig = avro_codec.read_avro_file

    def spy(path, *a, **k):
        opened.append(os.path.normpath(path))
        return orig(path, *a, **k)

    monkeypatch.setattr(avro_codec, "read_avro_file", spy)
    return opened


def _day_batch(spark, day, n=50, base="2024-01-01 00:00:00"):
    return spark.range(n).coalesce(1).select(
        (F.col("id") + day * 1000).alias("id"),
        (F.to_timestamp(F.lit(base)) +
         F.make_interval(days=F.lit(day))).alias("ts"),
    )


def _manifests_of(table):
    meta, _ = iw._load_meta(table)
    cur = next(
        s for s in meta["snapshots"]
        if int(s["snapshot-id"]) == int(meta["current-snapshot-id"])
    )
    return meta, [
        (os.path.normpath(str(r["manifest_path"])), r.get("partitions"))
        for r in avro_codec.read_avro_file(cur["manifest-list"])
    ]


def test_every_append_carries_summaries(spark, tmp_path):
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    for d in range(1, 4):
        iw.append_iceberg(_day_batch(spark, d), table)
    _meta, mfs = _manifests_of(table)
    assert len(mfs) == 4
    for _p, parts in mfs:
        assert parts is not None and len(parts) == 1
        s = parts[0]
        assert s["contains_null"] is False
        assert s["lower_bound"] is not None
        assert s["upper_bound"] is not None
    # each single-day manifest: lower == upper == that day's ordinal
    days = sorted(
        int.from_bytes(bytes(p[0]["lower_bound"]), "little")
        for _m, p in mfs
    )
    d0 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    assert days == [d0, d0 + 1, d0 + 2, d0 + 3]


def test_pruned_manifests_never_opened(spark, tmp_path, track_avro):
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    for d in range(1, 6):
        iw.append_iceberg(_day_batch(spark, d), table)
    _meta, mfs = _manifests_of(table)
    assert len(mfs) == 6
    track_avro.clear()
    lo = datetime.datetime(2024, 1, 3)
    got = ir.read_iceberg(
        spark, table,
        predicates=[("ts", ">=", lo),
                    ("ts", "<", lo + datetime.timedelta(days=2))],
    )
    assert got.count() == 100
    assert {r.id for r in got.collect()} == (
        {i + 2000 for i in range(50)} | {i + 3000 for i in range(50)}
    )
    opened = set(track_avro)
    manifest_paths = {m for m, _p in mfs}
    assert len(opened & manifest_paths) == 2  # days 3 and 4 only
    # the four out-of-range manifests were pruned WITHOUT being read
    assert len(manifest_paths - opened) == 4


def test_dict_filter_prunes_manifests(spark, tmp_path, track_avro):
    table = str(tmp_path / "t")
    df = spark.range(90).select(
        "id", (F.col("id") % 3).cast("int").alias("grp")
    ).repartition(3, "grp")
    iw.create_iceberg(df.where("grp = 0"), table, partition_by=["grp"])
    iw.append_iceberg(df.where("grp = 1"), table)
    iw.append_iceberg(df.where("grp = 2"), table)
    _meta, mfs = _manifests_of(table)
    assert len(mfs) == 3
    track_avro.clear()
    got = ir.read_iceberg(spark, table, partition_filter={"grp": 1})
    assert {r.id for r in got.collect()} == {
        i for i in range(90) if i % 3 == 1
    }
    opened = set(track_avro)
    assert len(opened & {m for m, _p in mfs}) == 1


def test_summaryless_manifests_kept_conservatively(
    spark, tmp_path, track_avro
):
    """A manifest-list entry with NO summaries (foreign / pre-r8
    writer) must always be decoded — never wrongly skipped."""
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    iw.append_iceberg(_day_batch(spark, 5), table)
    meta, _ = iw._load_meta(table)
    cur = next(
        s for s in meta["snapshots"]
        if int(s["snapshot-id"]) == int(meta["current-snapshot-id"])
    )
    rows = list(avro_codec.read_avro_file(cur["manifest-list"]))
    for r in rows:
        r["partitions"] = None
    avro_codec.write_avro_file(
        cur["manifest-list"], iw.mlist_schema(meta), rows
    )
    track_avro.clear()
    got = ir.read_iceberg(
        spark, table,
        predicates=[("ts", ">=", datetime.datetime(2024, 1, 6))],
    )
    assert got.count() == 50  # correct rows, file-level pruning only
    opened = set(track_avro)
    assert all(
        os.path.normpath(str(r["manifest_path"])) in opened for r in rows
    )


def test_null_partition_values_block_manifest_pruning(spark, tmp_path):
    """contains_null=True keeps the manifest: null pvs mean null
    source rows OR a spec-evolution rewrite — either way the planner
    cannot reason about them."""
    table = str(tmp_path / "t")
    withnull = _day_batch(spark, 0).withColumn(
        "ts",
        F.when(F.col("id") % 2 == 0, F.col("ts")).otherwise(F.lit(None)),
    )
    iw.create_iceberg(withnull, table, partition_by=["days(ts)"])
    _meta, mfs = _manifests_of(table)
    # the null-day manifest is flagged
    assert any(p[0]["contains_null"] for _m, p in mfs)
    got = ir.read_iceberg(
        spark, table,
        predicates=[("ts", ">=", datetime.datetime(2024, 1, 1))],
    )
    assert got.count() == 25  # nulls excluded by the residual, present


def test_summaries_survive_cow_dml(spark, tmp_path, track_avro):
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    for d in range(1, 4):
        iw.append_iceberg(_day_batch(spark, d), table)
    iceberg_dml.update_iceberg(
        spark, table, "id = 1001", {"id": "999999"}
    )
    _meta, mfs = _manifests_of(table)
    assert all(p is not None for _m, p in mfs)
    track_avro.clear()
    lo = datetime.datetime(2024, 1, 4)
    got = ir.read_iceberg(spark, table, predicates=[("ts", ">=", lo)])
    assert got.count() == 50
    opened = set(track_avro)
    # the DML rewrote days 0-3 into one manifest; day-3 rows live
    # there — but earlier single-day manifests that were carried
    # forward must still prune
    untouched = {m for m, p in mfs if p and len(p) == 1
                 and p[0]["upper_bound"] is not None}
    assert len(untouched & opened) < len(untouched) or len(mfs) == 1


def test_spec_evolution_old_manifests_always_decoded(
    spark, tmp_path, track_avro
):
    """Old-spec manifests (no value for the new field) must be KEPT by
    manifest pruning on predicates over the new field — while
    new-spec manifests outside the range are skipped unopened."""
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table)  # unpartitioned
    iw.add_partition_field(table, "days(ts)")
    for d in range(1, 4):
        iw.append_iceberg(_day_batch(spark, d), table)
    _meta, mfs = _manifests_of(table)
    assert len(mfs) == 4
    track_avro.clear()
    lo = datetime.datetime(2024, 1, 2)
    got = ir.read_iceberg(
        spark, table,
        predicates=[("ts", ">=", lo),
                    ("ts", "<", lo + datetime.timedelta(days=1))],
    )
    assert {r.id for r in got.collect()} == {i + 1000 for i in range(50)}
    opened = set(track_avro)
    manifest_paths = {m for m, _p in mfs}
    # old-spec manifest: decoded (conservative); day-1 manifest:
    # decoded (matches); day-2/day-3 manifests: never opened
    assert len(manifest_paths - opened) == 2


def test_datasource_writes_carry_summaries(spark, tmp_path, track_avro):
    from dst_spark_k8_lakehouse_spark.sources import iceberg_source

    iceberg_source.register(spark)
    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    for d in range(1, 3):
        (_day_batch(spark, d).write.format("iceberg_native")
         .mode("append").save(table))
    _meta, mfs = _manifests_of(table)
    assert len(mfs) == 3
    assert all(p is not None and p[0]["upper_bound"] is not None
               for _m, p in mfs)
    track_avro.clear()
    got = ir.read_iceberg(
        spark, table,
        predicates=[("ts", "==", datetime.datetime(2024, 1, 2))],
    )
    assert got.count() == 50
    assert len(set(track_avro) & {m for m, _p in mfs}) == 1


def test_datasource_reader_prunes_manifests_lazily(
    spark, tmp_path, track_avro
):
    """The iceberg_native read face plans LAZILY (r8): pushFilters
    arrive before any manifest is decoded, so the manifest-summary
    tier prunes whole manifests there too. Unit-level on _IceReader
    (the DataSource planning worker runs out-of-process, where a
    monkeypatch can't see it), plus an end-to-end value check."""
    from dst_spark_k8_lakehouse_spark.sources import iceberg_source

    table = str(tmp_path / "t")
    iw.create_iceberg(_day_batch(spark, 0), table,
                      partition_by=["days(ts)"])
    for d in range(1, 5):
        iw.append_iceberg(_day_batch(spark, d), table)
    _meta, mfs = _manifests_of(table)
    reader = iceberg_source._IceReader(table, None)
    track_avro.clear()
    assert track_avro == []  # __init__ decoded NOTHING (lazy)
    lo = datetime.datetime(2024, 1, 2)
    list(reader.pushFilters([]))  # no-op round keeps laziness
    reader._predicates.append(("ts", ">=", lo))
    reader._predicates.append(
        ("ts", "<", lo + datetime.timedelta(days=1))
    )
    entries = reader.entries
    assert len(entries) == 1  # one file, day 1
    opened = set(track_avro)
    assert len(opened & {m for m, _p in mfs}) == 1  # 4 never opened
    # dict-name equality on an identity DATE field normalizes into
    # the pv domain (epoch days) — end-to-end through the registered
    # format, where this returned ZERO rows before the r8 fix
    iceberg_source.register(spark)
    t2 = str(tmp_path / "t2")
    df = spark.range(100).select(
        "id",
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 5).cast("int")).alias("d"),
    )
    iw.create_iceberg(df, t2, partition_by=["d"])
    got = (
        spark.read.format("iceberg_native").load(t2)
        .where(F.col("d") == F.lit(datetime.date(2024, 1, 3)))
    )
    assert got.count() == 20


def test_manifest_pruning_is_superset_randomized(spark, tmp_path):
    """Property: the manifest tier may only ever SKIP manifests whose
    every file the file tier would also drop — a manifest containing
    ANY kept file must survive. Randomized over value distributions,
    manifest groupings, predicate shapes and transforms (the r5
    lesson: new pruning families get fuzzed fixtures from day one,
    exact-copy fixtures mask family-level defects)."""
    import random

    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_transforms as tr,
    )

    rnd = random.Random(80801)
    schema_fields = [
        {"id": 1, "name": "ts", "type": "timestamptz"},
        {"id": 2, "name": "k", "type": "long"},
        {"id": 3, "name": "s", "type": "string"},
    ]
    spec_variants = [
        [{"name": "ts_day", "transform": "day", "source-id": 1,
          "field-id": 1000}],
        [{"name": "k", "transform": "identity", "source-id": 2,
          "field-id": 1000}],
        [{"name": "k_bucket", "transform": "bucket[8]", "source-id": 2,
          "field-id": 1000}],
        [{"name": "s_trunc", "transform": "truncate[2]", "source-id": 3,
          "field-id": 1000},
         {"name": "ts_month", "transform": "month", "source-id": 1,
          "field-id": 1001}],
    ]
    ops = ["==", "<", "<=", ">", ">=", "in"]

    def rand_lit(col):
        if col == "ts":
            if rnd.random() < 0.5:
                return datetime.date(2024, 1, 1) + datetime.timedelta(
                    days=rnd.randrange(0, 40)
                )
            return datetime.datetime(2024, 1, 1) + datetime.timedelta(
                hours=rnd.randrange(0, 40 * 24)
            )
        if col == "k":
            return rnd.randrange(-5, 60)
        return rnd.choice(["ab", "cd", "abx", "zz", "a"])

    for trial in range(300):
        spec = rnd.choice(spec_variants)
        by_id = {f["id"]: f for f in schema_fields}
        # random pv population per spec field, in the pv domain
        def rand_pv():
            pv = {}
            for sf in spec:
                if rnd.random() < 0.08:
                    continue  # older-spec file: key absent
                if rnd.random() < 0.08:
                    pv[sf["name"]] = None
                    continue
                src = by_id[sf["source-id"]]
                tname, param = tr.parse_spec_transform(sf["transform"])
                t = tr.py_transform(tname, param, src["type"])
                rt = tr.result_type(tname, src["type"], src["name"])
                pv[sf["name"]] = tr.to_pv_domain(
                    t(rand_lit(src["name"])), rt
                )
            return pv

        files = [rand_pv() for _ in range(rnd.randrange(1, 12))]
        # group files into manifests and summarize like the writer
        manifests = []
        i = 0
        while i < len(files):
            n = rnd.randrange(1, 4)
            group = files[i:i + n]
            i += n
            summaries = []
            for sf in spec:
                src = by_id[sf["source-id"]]
                tname, _p = tr.parse_spec_transform(sf["transform"])
                rt = tr.result_type(tname, src["type"], sf["name"])
                vals = [
                    pv[sf["name"]] for pv in group
                    if pv.get(sf["name"]) is not None
                ]
                has_null = any(
                    sf["name"] not in pv or pv[sf["name"]] is None
                    for pv in group
                )
                lo_b = hi_b = None
                if vals:
                    lo_b = tr.summary_bound_bytes(min(vals), rt)
                    hi_b = tr.summary_bound_bytes(max(vals), rt)
                    if lo_b is None or hi_b is None:
                        lo_b = hi_b = None
                summaries.append({
                    "contains_null": has_null,
                    "contains_nan": None,
                    "lower_bound": lo_b,
                    "upper_bound": hi_b,
                })
            manifests.append((group, summaries))

        n_preds = rnd.randrange(1, 3)
        preds = []
        for _ in range(n_preds):
            col = rnd.choice(["ts", "k", "s"])
            op = rnd.choice(ops)
            lit = ([rand_lit(col) for _ in range(2)] if op == "in"
                   else rand_lit(col))
            preds.append((col, op, lit))
        file_pred = tr.partition_predicate(spec, schema_fields, preds)
        keep = tr.manifest_summary_predicate(schema_fields, preds)
        for group, summaries in manifests:
            if not keep(spec, summaries):
                survivors = [pv for pv in group if file_pred(pv)]
                assert not survivors, (
                    f"trial {trial}: manifest pruned but file tier "
                    f"keeps {survivors} under {preds} spec {spec}"
                )
