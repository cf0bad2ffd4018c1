"""Liquid clustering on native Delta logs — the spec's "Clustered
Table" writer feature (delta.io PROTOCOL.md: ``clustering`` +
``domainMetadata`` table features; ``delta.clustering`` domain).

Contracts under test: CREATE ... CLUSTER BY records the protocol +
domain; ``cluster_delta`` is INCREMENTAL (only files without the
current-generation clustered tag are rewritten — O(new data), not
O(table)); the pass is a pure reorganization (rows identical,
``dataChange: false``); domain metadata and add tags survive BOTH
checkpoint formats; ``alter_cluster_by`` is metadata-only and makes
old-generation files candidates again; and a clustered layout
actually tightens predicate pruning.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans.dml import execute_native_sql


def _mk(spark, tmp_path, name="t", n=400, parts=8):
    table = str(tmp_path / name)
    df = (
        spark.range(n)
        .select(
            # shuffled layout: every initial file spans the full id
            # range, so pre-clustering stats prune nothing
            F.xxhash64("id").alias("shuf"),
            F.col("id"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") * 2.0).alias("val"),
        )
        .repartitionByRange(parts, "shuf")
        .drop("shuf")
    )
    dw.create_delta(df, table, cluster_by=["id", "grp"])
    return table


def _tags(state):
    return {
        rel: (a.get("tags") or {}).get("clusteringProvider")
        for rel, a in state["files"].items()
    }


def test_create_records_protocol_and_domain(spark, tmp_path):
    table = _mk(spark, tmp_path)
    state = dr._replay(spark, table, None)
    p = state["protocol"]
    assert p["minWriterVersion"] == 7
    assert "clustering" in p["writerFeatures"]
    assert "domainMetadata" in p["writerFeatures"]
    assert p.get("minReaderVersion", 1) == 1  # writer-only features
    assert dw.clustering_columns(state) == ["id", "grp"]
    # fresh files are not clustered yet
    assert set(_tags(state).values()) == {None}


def test_cluster_delta_is_incremental(spark, tmp_path):
    table = _mk(spark, tmp_path)
    before = {r.id for r in dr.read_delta(spark, table).collect()}
    dw.cluster_delta(spark, table, n_files=4)
    state = dr._replay(spark, table, None)
    tags = _tags(state)
    assert set(tags.values()) == {"liquid:id,grp"}
    clustered_paths = set(tags)
    # append lands unclustered; the next pass rewrites ONLY it
    dw.append_delta(
        spark.range(400, 500).select(
            "id", (F.col("id") % 7).alias("grp"),
            (F.col("id") * 2.0).alias("val"),
        ).coalesce(2),
        table,
    )
    state = dr._replay(spark, table, None)
    assert set(_tags(state).values()) == {"liquid:id,grp", None}
    dw.cluster_delta(spark, table, n_files=1)
    state = dr._replay(spark, table, None)
    tags = _tags(state)
    assert set(tags.values()) == {"liquid:id,grp"}
    # the first pass's files survived untouched
    assert clustered_paths <= set(tags)
    assert len(set(tags) - clustered_paths) == 1  # the one new file
    got = {r.id for r in dr.read_delta(spark, table).collect()}
    assert got == before | set(range(400, 500))


def test_second_pass_is_a_noop(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v1 = dw.cluster_delta(spark, table)
    v2 = dw.cluster_delta(spark, table)
    assert v2 == v1  # nothing to do — no empty commit


def test_pure_reorg_datachange_false(spark, tmp_path):
    table = _mk(spark, tmp_path)
    import json

    v = dw.cluster_delta(spark, table, n_files=2)
    with open(
        os.path.join(table, "_delta_log", f"{v:020d}.json")
    ) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    files = [a for a in actions if "add" in a or "remove" in a]
    assert files and all(
        not (a.get("add") or a.get("remove"))["dataChange"]
        for a in files
    )


def test_clustering_tightens_pruning(spark, tmp_path):
    table = _mk(spark, tmp_path, n=4000, parts=8)
    preds = [("id", ">=", 0), ("id", "<", 400)]
    before = len(
        dr.plan_file_list(spark, table, predicates=preds)["files"]
    )
    assert before == 8  # shuffled layout: every file spans the range
    dw.cluster_delta(spark, table, n_files=8)
    after = len(
        dr.plan_file_list(spark, table, predicates=preds)["files"]
    )
    # two-column interleave: a 10% id slice shares bit-prefixes with
    # every grp value, so locality is partial — at least half the
    # files must prune (a shuffled layout prunes zero)
    assert after <= before // 2


def test_alter_cluster_by_metadata_only_then_reconverges(spark, tmp_path):
    table = _mk(spark, tmp_path)
    dw.cluster_delta(spark, table, n_files=2)
    n_commits_before = len(dr._commit_files(table))
    dw.alter_cluster_by(spark, table, ["val"])
    # metadata-only: exactly one commit, no file changed
    assert len(dr._commit_files(table)) == n_commits_before + 1
    state = dr._replay(spark, table, None)
    assert dw.clustering_columns(state) == ["val"]
    assert set(_tags(state).values()) == {"liquid:id,grp"}
    # every old-generation file is a candidate again
    dw.cluster_delta(spark, table, n_files=2)
    state = dr._replay(spark, table, None)
    assert set(_tags(state).values()) == {"liquid:val"}


def test_refusals(spark, tmp_path):
    df = spark.range(10).select(
        "id", (F.col("id") % 2).alias("grp")
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        dw.create_delta(
            df, str(tmp_path / "a"), partition_by=["grp"],
            cluster_by=["id"],
        )
    with pytest.raises(NotImplementedError, match="column-mapped"):
        dw.create_delta(
            df, str(tmp_path / "b"), column_mapping="name",
            cluster_by=["id"],
        )
    with pytest.raises(ValueError, match="not in"):
        dw.create_delta(df, str(tmp_path / "c"), cluster_by=["nope"])
    plain = str(tmp_path / "d")
    dw.create_delta(df, plain)
    with pytest.raises(ValueError, match="not a clustered table"):
        dw.cluster_delta(spark, plain)


@pytest.mark.parametrize("v2", [False, True])
def test_checkpoint_carries_domain_and_tags(spark, tmp_path, v2):
    table = _mk(spark, tmp_path)
    dw.cluster_delta(spark, table, n_files=2)
    if v2:
        v = dw.write_checkpoint_v2(spark, table, sidecar_files=2)
    else:
        v = dw.write_checkpoint(spark, table)
    log = os.path.join(table, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:-5]) <= v:
            os.unlink(os.path.join(log, f))
    state = dr._replay(spark, table, None)
    assert dw.clustering_columns(state) == ["id", "grp"]
    assert set(_tags(state).values()) == {"liquid:id,grp"}
    # the incremental contract holds ACROSS the checkpoint: a pass
    # with no new files is still a no-op
    assert dw.cluster_delta(spark, table) == int(state["version"])


def test_optimize_statement_runs_clustering(spark, tmp_path):
    table = _mk(spark, tmp_path)
    execute_native_sql(spark, "OPTIMIZE t", {"t": table})
    state = dr._replay(spark, table, None)
    assert set(_tags(state).values()) == {"liquid:id,grp"}
