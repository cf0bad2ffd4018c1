"""OPTIMIZE ZORDER BY on the NATIVE Delta log: a pure reorganization
(rows identical, dataChange=false) whose rewritten files carry tight
min/max spans on EVERY listed column — the property file/row-group
pruning keys off."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_dv
from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _spans(table, state, col):
    """Per-live-file (min, max) of ``col`` from the parquet footers."""
    import pyarrow.parquet as pq

    spans = []
    for rel in state["files"]:
        p = rel if os.path.isabs(rel) else os.path.join(table, rel)
        md = pq.ParquetFile(p)
        idx = md.schema_arrow.names.index(col)
        lo = min(
            md.metadata.row_group(g).column(idx).statistics.min
            for g in range(md.metadata.num_row_groups)
        )
        hi = max(
            md.metadata.row_group(g).column(idx).statistics.max
            for g in range(md.metadata.num_row_groups)
        )
        spans.append(hi - lo)
    return spans


def test_zorder_native_tightens_both_dimensions(spark, tmp_path):
    t = str(tmp_path / "z")
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    # 8 files, each spanning the FULL range of both columns
    dw.create_delta(df.repartition(8), t)
    before = dr._replay(spark, t, None)
    v = dw.zorder_delta(spark, t, ["a", "b"], n_files=8)
    after = dr._replay(spark, t, None)
    # pure reorg: identical rows, new version, dataChange=false adds
    got = {
        (r.a, r.b, r.payload) for r in dr.read_delta(spark, t).collect()
    }
    assert len(got) == n
    assert {r.payload for r in dr.read_delta(
        spark, t, version=0
    ).collect()} == set(range(n))
    # every file's span tightens on BOTH columns vs the shuffled layout
    for col in ("a", "b"):
        pre = sorted(_spans(t, before, col))
        post = sorted(_spans(t, after, col))
        assert sum(post) < sum(pre) * 0.7, (col, pre, post)
    with open(os.path.join(t, "_delta_log",
                           f"{v:020d}.json")) as fh:
        import json

        acts = [json.loads(ln) for ln in fh if ln.strip()]
    assert all(
        a["add"]["dataChange"] is False for a in acts if "add" in a
    )


def test_zorder_native_partitioned_stays_in_partition(spark, tmp_path):
    t = str(tmp_path / "zp")
    df = spark.range(600).select(
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") % 50).alias("a"),
        F.col("id").alias("payload"),
    )
    dw.create_delta(df.repartition(4), t, partition_by=["g"])
    dw.zorder_delta(spark, t, ["a"], n_files=2)
    state = dr._replay(spark, t, None)
    for rel, a in state["files"].items():
        assert rel.startswith("g="), rel
        assert a["partitionValues"]["g"] == rel.split("=")[1].split("/")[0]
    got = {
        (r.g, r.payload) for r in dr.read_delta(spark, t).collect()
    }
    assert got == {(i % 3, i) for i in range(600)}
    with pytest.raises(ValueError, match="partition columns"):
        dw.zorder_delta(spark, t, ["g"])


def test_zorder_refuses_over_dvs(spark, tmp_path):
    t = str(tmp_path / "zdv")
    dw.create_delta(spark.range(100).coalesce(1), t)
    delta_dv.delete_where_dv(spark, t, "id = 1")
    with pytest.raises(NotImplementedError, match="materialize"):
        dw.zorder_delta(spark, t, ["id"])
