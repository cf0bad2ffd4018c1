"""Iceberg write-audit-publish (r10): branch writes
(``append_iceberg(branch=...)``), ``fast_forward`` publish with the
ancestry check, ``cherry_pick_snapshot`` for a moved main, ref-pinned
``expire_snapshots``, and the statement-text ref DDL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import (
    dml,
    iceberg_reader as ir,
    iceberg_writer as iw,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("x")
    )


def _ids(spark, t, **kw):
    return {r.id for r in ir.read_iceberg(spark, t, **kw).collect()}


def test_branch_append_isolation(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 100), t)
    meta0, _ = iw._load_meta(t)
    main_head = meta0["current-snapshot-id"]
    log_len = len(meta0["snapshot-log"])
    iw.create_branch(t, "audit")
    staged = iw.append_iceberg(_rows(spark, 100, 150), t, branch="audit")
    assert staged > 0
    # main untouched: pointer, log, and reads
    meta1, _ = iw._load_meta(t)
    assert meta1["current-snapshot-id"] == main_head
    assert len(meta1["snapshot-log"]) == log_len
    assert _ids(spark, t) == set(range(100))
    # the branch sees base + staged; its snapshot records its parent
    assert _ids(spark, t, ref="audit") == set(range(150))
    snap = next(s for s in meta1["snapshots"]
                if s["snapshot-id"] == staged)
    assert snap["parent-snapshot-id"] == main_head
    # unknown branch refuses
    with pytest.raises(ValueError, match="not in table"):
        iw.append_iceberg(_rows(spark, 0, 1), t, branch="nope")


def test_fast_forward_publish_and_log(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 100), t)
    iw.create_branch(t, "audit")
    s1 = iw.append_iceberg(_rows(spark, 100, 150), t, branch="audit")
    s2 = iw.append_iceberg(_rows(spark, 150, 160), t, branch="audit")
    meta, _ = iw._load_meta(t)
    log_before = [e["snapshot-id"] for e in meta["snapshot-log"]]
    got = iw.fast_forward(t, "main", "audit")
    assert got == s2
    assert _ids(spark, t) == set(range(160))
    meta2, _ = iw._load_meta(t)
    assert meta2["current-snapshot-id"] == s2
    # both staged snapshots joined main's lineage, in order
    assert [e["snapshot-id"] for e in meta2["snapshot-log"]] == \
        log_before + [s1, s2]
    # idempotent re-publish is a no-op
    assert iw.fast_forward(t, "main", "audit") == s2
    iw.drop_ref(t, "audit")
    with pytest.raises(ValueError, match="not in table"):
        ir.read_iceberg(spark, t, ref="audit")


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 50), t)
    iw.create_branch(t, "audit")
    iw.append_iceberg(_rows(spark, 100, 120), t, branch="audit")
    # main moves independently → audit's head no longer descends from
    # main's head → NOT a fast-forward
    iw.append_iceberg(_rows(spark, 50, 60), t)
    with pytest.raises(ValueError, match="diverged"):
        iw.fast_forward(t, "main", "audit")
    # main unchanged by the refusal
    assert _ids(spark, t) == set(range(60))


def test_cherry_pick_onto_moved_main(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 50), t)
    iw.create_branch(t, "audit")
    staged = iw.append_iceberg(_rows(spark, 100, 130), t, branch="audit")
    iw.append_iceberg(_rows(spark, 50, 60), t)  # main moves
    new_id = iw.cherry_pick_snapshot(spark, t, staged)
    assert new_id > 0
    assert _ids(spark, t) == set(range(60)) | set(range(100, 130))
    meta, _ = iw._load_meta(t)
    assert meta["current-snapshot-id"] == new_id
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == new_id)
    assert snap["summary"]["source-snapshot-id"] == str(staged)
    # non-append snapshots refuse (their removals can't replay safely)
    ov = iw.overwrite_iceberg(_rows(spark, 0, 10), t)
    with pytest.raises(NotImplementedError, match="cherry-pick"):
        iw.cherry_pick_snapshot(spark, t, ov)


def test_wap_on_partitioned_table_prunes_after_publish(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id"),
        F.expr(
            "date_add(date'2024-01-01', cast(id % 10 as int))"
        ).alias("d"),
    )
    iw.create_iceberg(df.where("id < 100"), t, partition_by=["d"])
    iw.create_branch(t, "stage")
    iw.append_iceberg(df.where("id >= 100"), t, branch="stage")
    iw.fast_forward(t, "main", "stage")
    got = ir.read_iceberg(
        spark, t, predicates=[("d", "==", "2024-01-03")]
    )
    assert {r.id for r in got.collect()} == {
        i for i in range(200) if i % 10 == 2
    }
    # partition pruning engages across the published branch manifests
    assert len(set(got.inputFiles())) < len(
        set(ir.read_iceberg(spark, t).inputFiles())
    )


def test_expire_snapshots_pins_ref_heads(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 40), t)
    iw.create_branch(t, "keepme")
    staged = iw.append_iceberg(_rows(spark, 100, 120), t, branch="keepme")
    iw.create_tag(t, "v1")
    for lo in (40, 60, 80):
        iw.append_iceberg(_rows(spark, lo, lo + 20), t)
    iw.expire_snapshots(spark, t, retain_last=1)
    meta, _ = iw._load_meta(t)
    kept = {s["snapshot-id"] for s in meta["snapshots"]}
    assert staged in kept  # the branch head survived
    # and its data files still read through the ref
    assert _ids(spark, t, ref="keepme") == set(range(40)) | set(
        range(100, 120)
    )
    assert _ids(spark, t, ref="v1") == set(range(40))
    assert _ids(spark, t) == set(range(100))


def test_statement_text_ref_ddl_and_fast_forward(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 30), t)
    tables = {"t": t}
    dml.execute_native_sql(spark, "ALTER TABLE t CREATE BRANCH audit",
                           tables)
    iw.append_iceberg(_rows(spark, 30, 45), t, branch="audit")
    dml.execute_native_sql(
        spark, "CALL system.fast_forward('t', 'main', 'audit')", tables
    )
    assert _ids(spark, t) == set(range(45))
    dml.execute_native_sql(spark, "ALTER TABLE t DROP BRANCH audit",
                           tables)
    meta, _ = iw._load_meta(t)
    assert "audit" not in (meta.get("refs") or {})
    dml.execute_native_sql(spark, "ALTER TABLE t CREATE TAG v1", tables)
    assert _ids(spark, t, ref="v1") == set(range(45))


def test_datasource_reads_branch_ref(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.sources import iceberg_source

    iceberg_source.register(spark)
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 40), t)
    iw.create_branch(t, "audit")
    iw.append_iceberg(_rows(spark, 40, 55), t, branch="audit")
    main = spark.read.format("iceberg_native").load(t)
    staged = (
        spark.read.format("iceberg_native").option("ref", "audit").load(t)
    )
    assert {r.id for r in main.collect()} == set(range(40))
    assert {r.id for r in staged.collect()} == set(range(55))
    with pytest.raises(Exception, match="not in table"):
        spark.read.format("iceberg_native").option(
            "branch", "nope"
        ).load(t).collect()


def test_statement_text_cherrypick(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 20), t)
    iw.create_branch(t, "stage")
    staged = iw.append_iceberg(_rows(spark, 100, 110), t, branch="stage")
    iw.append_iceberg(_rows(spark, 20, 25), t)  # main diverges
    got = dml.execute_native_sql(
        spark,
        f"CALL system.cherrypick_snapshot('t', {staged})",
        {"t": t},
    )
    assert got > 0
    assert _ids(spark, t) == set(range(25)) | set(range(100, 110))


def test_main_ref_name_reserved(spark, tmp_path):
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 10), t)
    with pytest.raises(ValueError, match="reserved"):
        iw.create_branch(t, "main")
    with pytest.raises(ValueError, match="reserved"):
        iw.create_tag(t, "main")


def test_wap_across_spec_evolution(spark, tmp_path):
    """Partition-spec evolution mid-branch: the table evolves AFTER
    the branch was cut; staged appends written before the publish use
    whatever the CURRENT default spec is at their commit (spec
    resolution is per MANIFEST, so the published read prunes each
    manifest against its own spec — the same rule x6 pins on main)."""
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id"),
        F.expr(
            "date_add(date'2024-01-01', cast(id % 6 as int))"
        ).alias("d"),
    )
    iw.create_iceberg(df.where("id < 100"), t)  # UNPARTITIONED
    iw.create_branch(t, "stage")
    iw.append_iceberg(df.where("id >= 100 and id < 200"), t,
                      branch="stage")
    # evolve the default spec while the branch is live
    iw.add_partition_field(t, "d")
    iw.append_iceberg(df.where("id >= 200"), t, branch="stage")
    iw.fast_forward(t, "main", "stage")
    got = ir.read_iceberg(spark, t, predicates=[("d", "==",
                                                 "2024-01-03")])
    assert {r.id for r in got.collect()} == {
        i for i in range(300) if i % 6 == 2
    }
    # old-spec files are conservatively kept; the new-spec slice prunes
    full_files = set(ir.read_iceberg(spark, t).inputFiles())
    assert len(set(got.inputFiles())) < len(full_files)


def test_fast_forward_branch_to_ref(spark, tmp_path):
    """fast_forward moves ANY branch, not just main — dev tracks
    staging after staging verified; a tag works as the `to` target."""
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 20), t)
    iw.create_branch(t, "staging")
    iw.create_branch(t, "dev")
    s1 = iw.append_iceberg(_rows(spark, 20, 30), t, branch="staging")
    got = iw.fast_forward(t, "dev", "staging")
    assert got == s1
    assert _ids(spark, t, ref="dev") == set(range(30))
    assert _ids(spark, t) == set(range(20))  # main untouched
    # a tag as the target
    iw.create_tag(t, "v1", s1)
    iw.create_branch(t, "dev2")
    assert iw.fast_forward(t, "dev2", "v1") == s1
    with pytest.raises(ValueError, match="not in table"):
        iw.fast_forward(t, "nope", "staging")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_wap_lineage_fuzz_against_model(spark, tmp_path, seed):
    """Randomized interleavings of main appends, branch appends,
    branch creation/publish/drop — checked every step against a plain
    Python model of {main: set, branches: {name: set}}. Catches
    lineage leaks in either direction (a staged row on main, a main
    row missing from a branch cut after it, a publish losing rows)."""
    import random

    rng = random.Random(seed)
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 10), t)
    model_main = set(range(10))
    model_branch: dict[str, set] = {}
    next_lo = 100
    for step in range(14):
        ops = ["main_append"]
        if len(model_branch) < 2:
            ops.append("create")
        if model_branch:
            ops += ["branch_append", "publish", "drop"]
        op = rng.choice(ops)
        if op == "create":
            name = f"b{step}"
            iw.create_branch(t, name)
            model_branch[name] = set(model_main)
        elif op == "main_append":
            lo, next_lo = next_lo, next_lo + rng.randrange(3, 8)
            iw.append_iceberg(_rows(spark, lo, next_lo), t)
            model_main |= set(range(lo, next_lo))
        elif op == "branch_append":
            name = rng.choice(sorted(model_branch))
            lo, next_lo = next_lo, next_lo + rng.randrange(3, 8)
            iw.append_iceberg(_rows(spark, lo, next_lo), t, branch=name)
            model_branch[name] |= set(range(lo, next_lo))
        elif op == "publish":
            name = rng.choice(sorted(model_branch))
            # fast-forwardable iff main's rows ⊆ the branch's rows
            if model_main <= model_branch[name]:
                iw.fast_forward(t, "main", name)
                model_main = set(model_branch[name])
            else:
                with pytest.raises(ValueError, match="diverged"):
                    iw.fast_forward(t, "main", name)
        elif op == "drop":
            name = rng.choice(sorted(model_branch))
            iw.drop_ref(t, name)
            del model_branch[name]
        assert _ids(spark, t) == model_main, (step, op)
        for name, want in model_branch.items():
            assert _ids(spark, t, ref=name) == want, (step, op, name)


def test_incremental_scan_skips_unpublished_branch(spark, tmp_path):
    """read_iceberg_incremental must walk the ANCESTRY, not the id
    range: a branch staged between two main appends interleaves in
    commit order, and the pre-r10 range walk would have fed its rows
    to incremental consumers before (or without) publication."""
    from dst_spark_k8_lakehouse_spark.plans import iceberg_meta as im

    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 20), t)
    meta, _ = iw._load_meta(t)
    s0 = int(meta["current-snapshot-id"])
    iw.create_branch(t, "stage")
    s_main1 = iw.append_iceberg(_rows(spark, 20, 30), t)
    staged = iw.append_iceberg(_rows(spark, 100, 110), t,
                               branch="stage")
    s_main2 = iw.append_iceberg(_rows(spark, 30, 40), t)
    inc = im.read_iceberg_incremental(spark, t, s0, s_main2)
    got = {r.id for r in inc.collect()}
    assert got == set(range(20, 40))  # NO staged rows leaked
    # the BRANCH lineage is itself incrementally readable (from the
    # branch point to the staged head — a branch consumer's feed)
    assert {
        r.id
        for r in im.read_iceberg_incremental(
            spark, t, s0, staged
        ).collect()
    } == set(range(100, 110))
    # but across lineages (a main snapshot to an unpublished staged
    # one) it is loud, not wrong rows
    with pytest.raises(ValueError, match="not an ancestor"):
        im.read_iceberg_incremental(spark, t, s_main1, staged)
    # after a cherry-pick publish, the incremental feed includes it
    pub = iw.cherry_pick_snapshot(spark, t, staged)
    inc2 = im.read_iceberg_incremental(spark, t, s_main2, pub)
    assert {r.id for r in inc2.collect()} == set(range(100, 110))
    assert s_main1 in iw._ancestry(iw._load_meta(t)[0], pub)


def test_changelog_skips_unpublished_branch(spark, tmp_path):
    """The row-level changelog walks main's lineage: staged branch
    rows never appear as inserts, and a cross-lineage range is loud."""
    from dst_spark_k8_lakehouse_spark.plans import iceberg_meta as im

    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 15), t)
    meta, _ = iw._load_meta(t)
    s0 = int(meta["current-snapshot-id"])
    iw.create_branch(t, "stage")
    s_main1 = iw.append_iceberg(_rows(spark, 15, 25), t)
    staged = iw.append_iceberg(_rows(spark, 100, 105), t,
                               branch="stage")
    log = im.read_iceberg_changelog(spark, t, s0)
    got = {(r.id, r._change_type) for r in log.collect()}
    assert got == {(i, "insert") for i in range(15, 25)}
    with pytest.raises(ValueError, match="not an ancestor"):
        im.read_iceberg_changelog(spark, t, s_main1, staged)
    # the branch's own changelog reads from the branch point
    blog = im.read_iceberg_changelog(spark, t, s0, staged)
    assert {(r.id, r._change_type) for r in blog.collect()} == {
        (i, "insert") for i in range(100, 105)
    }


def test_rollback_refuses_staged_target(spark, tmp_path):
    """rollback_to_snapshot moves BACK along main's lineage only —
    rolling onto an unpublished staged snapshot would smuggle branch
    rows onto main without a publish (that move is fast_forward's)."""
    t = str(tmp_path / "t")
    iw.create_iceberg(_rows(spark, 0, 10), t)
    meta, _ = iw._load_meta(t)
    s0 = int(meta["current-snapshot-id"])
    iw.create_branch(t, "stage")
    staged = iw.append_iceberg(_rows(spark, 100, 105), t,
                               branch="stage")
    iw.append_iceberg(_rows(spark, 10, 20), t)
    with pytest.raises(ValueError, match="not an ancestor"):
        iw.rollback_iceberg(spark, t, staged)
    iw.rollback_iceberg(spark, t, s0)  # a true ancestor still works
    assert _ids(spark, t) == set(range(10))


def test_ref_retention_max_ref_age_expires_ref(spark, tmp_path):
    t = str(tmp_path / "age")
    iw.create_iceberg(_rows(spark, 0, 20), t)
    # a tag already 'too old' (max-ref-age-ms=1: any elapsed time
    # exceeds it) and one with a generous window
    iw.create_tag(t, "stale", max_ref_age_ms=1)
    iw.create_tag(t, "fresh", max_ref_age_ms=10**12)
    import time as _t

    _t.sleep(0.01)
    iw.append_iceberg(_rows(spark, 20, 30), t)
    iw.expire_snapshots(spark, t, retain_last=1)
    meta, _ = iw._load_meta(t)
    assert "stale" not in meta["refs"]  # written-down policy applied
    assert "fresh" in meta["refs"]
    assert _ids(spark, t, ref="fresh") == set(range(20))


def test_ref_retention_refs_only_expiry_commits(spark, tmp_path):
    # a ref expires even when NO snapshot drops (its head is current)
    t = str(tmp_path / "only")
    iw.create_iceberg(_rows(spark, 0, 10), t)
    iw.create_tag(t, "stale", max_ref_age_ms=1)
    import time as _t

    _t.sleep(0.01)
    iw.expire_snapshots(spark, t, retain_last=5)
    meta, _ = iw._load_meta(t)
    assert "stale" not in meta["refs"]
    assert len(meta["snapshots"]) == 1  # nothing else changed


def test_branch_min_snapshots_to_keep_pins_ancestry(spark, tmp_path):
    t = str(tmp_path / "anc")
    iw.create_iceberg(_rows(spark, 0, 10), t)
    iw.create_branch(t, "b", min_snapshots_to_keep=3)
    s1 = iw.append_iceberg(_rows(spark, 10, 20), t, branch="b")
    s2 = iw.append_iceberg(_rows(spark, 20, 30), t, branch="b")
    s3 = iw.append_iceberg(_rows(spark, 30, 40), t, branch="b")
    meta0, _ = iw._load_meta(t)
    create_snap = min(int(s["snapshot-id"]) for s in meta0["snapshots"])
    iw.append_iceberg(_rows(spark, 100, 110), t)  # main moves too
    iw.expire_snapshots(spark, t, retain_last=1)
    meta, _ = iw._load_meta(t)
    kept = {int(s["snapshot-id"]) for s in meta["snapshots"]}
    # min-snapshots-to-keep=3 pins the head + 2 ancestors: s1/s2/s3
    # survive, the branch's base (the create snapshot) expires
    assert {s1, s2, s3} <= kept
    assert create_snap not in kept
    # branch time travel inside the window still works
    assert _ids(spark, t, snapshot_id=s2) == set(range(30))


def test_tag_refuses_branch_retention_fields(spark, tmp_path):
    t = str(tmp_path / "tr")
    iw.create_iceberg(_rows(spark, 0, 5), t)
    with pytest.raises(ValueError, match="branch retention"):
        iw.create_tag(t, "x", min_snapshots_to_keep=2)
