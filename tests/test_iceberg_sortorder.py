"""Iceberg SORT ORDER + sort-aware rewrite (r8, VERDICT r7 item 3):
``set_sort_order`` records the spec's ``sort-orders`` metadata;
``rewrite_data_files`` clusters live rows (lexical or through the
shared Z-ORDER kernel) so the manifest column-bounds tier (D47) can
skip files on UNPARTITIONED columns — the mirror of the Delta
ZORDER-composes-with-skipping test from r7. The maintenance job's
bin-pack goes sort-aware when a layout is declared."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import (
    iceberg_mor,
    iceberg_reader as ir,
    iceberg_writer as iw,
)


def _shuffled(spark, n=4000):
    # interleaved ids: every pre-rewrite file spans nearly the full id
    # range, so bounds-based skipping has nothing to bite on
    return spark.range(n).select(
        ((F.col("id") * 2654435761) % n).alias("id"),
        (F.col("id") % 97).cast("long").alias("x"),
        F.concat(F.lit("p"), (F.col("id") % 13).cast("string"))
        .alias("cat"),
    ).repartition(8)


def _files(df):
    return set(df.inputFiles())


def test_set_sort_order_metadata(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t)
    oid = iw.set_sort_order(t, ["id", "x"])
    meta, _ = iw._load_meta(t)
    assert meta["default-sort-order-id"] == oid == 1
    order = next(
        o for o in meta["sort-orders"] if o["order-id"] == oid
    )
    assert [
        (f["transform"], f["source-id"], f["direction"], f["null-order"])
        for f in order["fields"]
    ] == [("identity", 1, "asc", "nulls-first"),
          ("identity", 2, "asc", "nulls-first")]
    assert iw.default_sort_columns(meta) == ["id", "x"]
    # order 0 (unsorted) stays in the list per the spec
    assert any(o["order-id"] == 0 for o in meta["sort-orders"])
    with pytest.raises(ValueError, match="not in schema"):
        iw.set_sort_order(t, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        iw.set_sort_order(t, [])


def test_rewrite_under_default_order_tightens_bounds(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t)
    # before: every file spans ~the full id range → no skipping
    before = ir.read_iceberg(spark, t, predicates=[("id", "<", 100)])
    n_before = len(_files(before))
    assert n_before == 8
    iw.set_sort_order(t, ["id"])
    snap = iw.rewrite_data_files(spark, t, target_files=8)
    assert snap > 0
    after = ir.read_iceberg(spark, t, predicates=[("id", "<", 100)])
    assert {r.id for r in after.collect()} == {
        r.id for r in before.collect()
    }
    assert len(_files(after)) < n_before  # bounds now bite
    assert len(_files(after)) <= 2
    # full reads unchanged
    assert ir.read_iceberg(spark, t).count() == 4000


def test_zorder_rewrite_clusters_both_dimensions(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t)
    iw.rewrite_data_files(spark, t, sort_order="zorder(id, x)",
                          target_files=8)
    got_id = ir.read_iceberg(spark, t, predicates=[("id", "<", 200)])
    got_x = ir.read_iceberg(spark, t, predicates=[("x", "<", 5)])
    assert len(_files(got_id)) < 8
    assert len(_files(got_x)) < 8
    # values stay exact on both dimensions
    assert got_id.count() == 200
    assert got_x.count() == 4000 // 97 * 5 + min(4000 % 97, 5)


def test_rewrite_validation_and_explicit_cols(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t)
    with pytest.raises(ValueError, match="no default"):
        iw.rewrite_data_files(spark, t)
    with pytest.raises(ValueError, match="not in schema"):
        iw.rewrite_data_files(spark, t, sort_order=["nope"])
    with pytest.raises(ValueError, match="not in schema"):
        iw.rewrite_data_files(spark, t, sort_order="zorder(id, nope)")
    iw.rewrite_data_files(spark, t, sort_order=["cat"], target_files=4)
    got = ir.read_iceberg(spark, t, predicates=[("cat", "==", "p3")])
    assert len(_files(got)) <= 2
    assert got.count() == 4000 // 13 + (1 if 3 < 4000 % 13 else 0)


def test_rewrite_folds_mor_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t, format_version=2)
    iceberg_mor.delete_where_mor(spark, t, "id < 500")
    stats = iceberg_mor.mor_file_stats(spark, t)
    assert stats["position_delete_files"] + stats[
        "equality_delete_files"] > 0
    iw.set_sort_order(t, ["id"])
    iw.rewrite_data_files(spark, t, target_files=4)
    stats2 = iceberg_mor.mor_file_stats(spark, t)
    assert stats2["position_delete_files"] == 0
    assert stats2["equality_delete_files"] == 0
    got = ir.read_iceberg(spark, t)
    assert got.count() == 3500
    assert got.where("id < 500").count() == 0


def test_maintenance_job_goes_sort_aware(spark, tmp_path):
    import importlib

    job = importlib.import_module("jobs.iceberg_maintenance")
    t = str(tmp_path / "t")
    iw.create_iceberg(_shuffled(spark), t)
    for _ in range(2):  # grow the file count past target
        iw.append_iceberg(_shuffled(spark), t)
    iw.set_sort_order(t, ["id"])
    report = job.run_maintenance(spark, t, retain_last=1,
                                 target_files=6)
    assert report["rewritten_snapshot"] > 0
    assert report["after"]["data_files"] <= 6
    got = ir.read_iceberg(spark, t, predicates=[("id", "<", 100)])
    assert len(_files(got)) <= 2  # the bin-pack also clustered
    assert ir.read_iceberg(spark, t).count() == 12000
