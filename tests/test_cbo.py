"""Statistics-driven join planning (``plans/cbo``): table profiles
from metadata sidecars (Delta crc + per-add stats, Iceberg snapshot
summary totals + Puffin NDV), an auditable broadcast-vs-shuffle
decision, and the plan-shape proof that the hint actually lands where
Spark's own scan-size guess would have sort-merge-joined.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import cbo
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import (
    iceberg_partition_stats as ips,
)
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw


def _dim(spark, tmp_path):
    path = str(tmp_path / "dim")
    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    ).coalesce(1)
    iw.create_iceberg(df, path)
    iw.write_table_statistics(spark, path, k=1024)
    return path


def _fact(spark, tmp_path, n=5000):
    path = str(tmp_path / "fact")
    df = spark.range(n).select(
        (F.col("id") % 50).alias("k"),
        (F.col("id") * 2).alias("v"),
    ).repartition(4)
    dw.create_delta(df, path)
    return path


def test_delta_profile_from_metadata(spark, tmp_path):
    path = _fact(spark, tmp_path, n=1000)
    prof = cbo.table_profile(spark, path)
    assert prof["format"] == "delta"
    assert prof["rows"] == 1000
    assert prof["bytes"] > 0


def test_iceberg_profile_uses_summary_not_a_walk(
    spark, tmp_path, monkeypatch
):
    path = _dim(spark, tmp_path)
    iw.append_iceberg(
        spark.range(50, 80).select(
            F.col("id").alias("k"), F.lit("x").alias("name")
        ).coalesce(1),
        path,
    )
    # summary totals chain across appends -> the profile never walks
    monkeypatch.setattr(
        ips, "compute_partition_stats",
        lambda *a, **k: pytest.fail("walk should not run"),
    )
    prof = cbo.table_profile(spark, path)
    assert prof["format"] == "iceberg"
    assert prof["rows"] == 80
    assert prof["bytes"] > 0
    assert prof["ndv"]  # Puffin sketches registered at create


def test_advise_broadcast_and_shuffle(spark):
    small = {"format": "iceberg", "rows": 50, "bytes": 1 << 10,
             "ndv": {"k": 50.0}}
    big = {"format": "delta", "rows": 10**9, "bytes": 1 << 40,
           "ndv": {}}
    adv = cbo.advise_join(big, small, ["k"])
    assert adv["strategy"] == "broadcast"
    assert adv["broadcast_side"] == "right"
    assert adv["unique_build_key"] is True
    assert any("broadcast" in r for r in adv["reasons"])
    both_big = cbo.advise_join(big, dict(big), ["k"])
    assert both_big["strategy"] == "shuffle"
    assert both_big["broadcast_side"] is None


def test_advise_flags_skew(spark):
    skewed = {"format": "delta", "rows": 10**8, "bytes": 1 << 40,
              "ndv": {"country": 37.0}}
    other = {"format": "delta", "rows": 10**8, "bytes": 1 << 40,
             "ndv": {}}
    adv = cbo.advise_join(skewed, other, ["country"])
    assert adv["skew_keys"] == ["left.country"]
    assert any("salt" in r for r in adv["reasons"])


def test_join_hint_lands_in_the_plan(spark, tmp_path):
    dim = _dim(spark, tmp_path)
    fact = _fact(spark, tmp_path)
    dim_df = ir.read_iceberg(spark, dim)
    from dst_spark_k8_lakehouse_spark.plans import delta_reader

    fact_df = delta_reader.read_delta(spark, fact)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Spark's own size-based broadcast OFF: only our hint can
        # produce a broadcast join now
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = fact_df.join(dim_df, ["k"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" not in plain
        joined, advice = cbo.join_with_stats(
            fact_df, dim_df, ["k"],
            cbo.table_profile(spark, fact),
            cbo.table_profile(spark, dim),
        )
        assert advice["broadcast_side"] == "right"
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # and the result is the join, intact
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plan_star_join_orders_and_hints_in_one_call(spark, tmp_path):
    """r12 (VERDICT r11 item 8): ``plan_star_join`` packages profile →
    order → hint — on a skewed fixture (one dim joins ~5× selectively,
    the other 1:1) the executed plan must join the SELECTIVE dim
    first and broadcast both dims, with Spark's own size-based
    broadcasting disabled so only the advisor's hints can act."""
    fact = str(tmp_path / "fact")
    whole = str(tmp_path / "whole")
    sel = str(tmp_path / "sel")
    n_keys = 100
    iw.create_iceberg(
        spark.range(8000).select(
            (F.col("id") % n_keys).alias("wk"),
            (F.col("id") % n_keys).alias("sk"),
            (F.col("id") * 3).alias("v"),
        ).repartition(4),
        fact,
    )
    iw.create_iceberg(
        spark.range(n_keys).select(
            F.col("id").alias("wk"),
            F.concat(F.lit("w-"), F.col("id")).alias("wname"),
        ).coalesce(1),
        whole,
    )
    # the selective dim covers only a fifth of the fact's key domain
    iw.create_iceberg(
        spark.range(n_keys // 5).select(
            F.col("id").alias("sk"),
            F.concat(F.lit("s-"), F.col("id")).alias("sname"),
        ).coalesce(1),
        sel,
    )
    for t in (fact, whole, sel):
        iw.write_table_statistics(spark, t, k=1024)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined, plan = cbo.plan_star_join(
            spark, fact, [(whole, ["wk"]), (sel, ["sk"])]
        )
        assert plan["order"] == [sel, whole], plan["reasons"]
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert executed.count("BroadcastHashJoin") == 2
        # correctness: only fact rows whose sk survives the selective
        # dim remain, each enriched from both dims
        expected = 8000 // 5
        assert joined.count() == expected
        assert joined.filter(
            F.col("sname").isNull() | F.col("wname").isNull()
        ).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plan_star_join_broadcasts_tiny_fact(spark, tmp_path):
    """When the FACT side is the broadcastable one (tiny fact, big
    dim, threshold between them), the hint lands on the running side
    — the advisor's 'left' branch."""
    fact = str(tmp_path / "tinyfact")
    dim = str(tmp_path / "bigdim")
    iw.create_iceberg(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        ).coalesce(1),
        fact,
    )
    iw.create_iceberg(
        spark.range(20000).select(
            (F.col("id") % 20).alias("k"),
            F.concat(F.lit("pad-"), F.col("id")).alias("pad"),
        ).repartition(4),
        dim,
    )
    for t in (fact, dim):
        iw.write_table_statistics(spark, t, k=1024)
    fact_bytes = cbo.table_profile(spark, fact)["bytes"]
    dim_bytes = cbo.table_profile(spark, dim)["bytes"]
    assert fact_bytes < dim_bytes
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined, plan = cbo.plan_star_join(
            spark, fact, [(dim, ["k"])],
            broadcast_bytes=(fact_bytes + dim_bytes) // 2,
        )
        assert plan["steps"][0]["advice"]["broadcast_side"] == "left"
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in executed
        assert joined.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plan_star_join_frame_override(spark, tmp_path):
    """A caller-supplied frame (column-pruned read) replaces the
    default read for that path while profiling still uses metadata."""
    dim = _dim(spark, tmp_path)
    fact = _fact(spark, tmp_path, n=800)
    pruned = ir.read_iceberg(spark, dim).select("k")
    joined, plan = cbo.plan_star_join(
        spark, fact, [(dim, ["k"])], frames={dim: pruned}
    )
    assert joined.columns == ["k", "v"]  # no dim payload: pruned in
    assert joined.count() == 800
    assert plan["order"] == [dim]


def test_plan_star_join_role_playing_dims(spark, tmp_path):
    """ADVICE r12: the same dimension path joined TWICE (role-playing
    — e.g. one date dim as order date and ship date) must execute
    BOTH joins instead of silently collapsing to the last keys.
    Duplicate paths get position labels ``path#i`` through the plan;
    ``frames`` keyed by label give each role its renamed columns."""
    dates = str(tmp_path / "dates")
    fact = str(tmp_path / "rfact")
    iw.create_iceberg(
        spark.range(30).select(
            F.col("id").alias("dk"),
            F.concat(F.lit("day-"), F.col("id")).alias("dname"),
        ).coalesce(1),
        dates,
    )
    iw.write_table_statistics(spark, dates, k=1024)
    dw.create_delta(
        spark.range(900).select(
            (F.col("id") % 30).alias("order_dk"),
            ((F.col("id") + 7) % 30).alias("ship_dk"),
            (F.col("id") * 2).alias("v"),
        ).repartition(4),
        fact,
    )
    base = ir.read_iceberg(spark, dates)
    joined, plan = cbo.plan_star_join(
        spark, fact,
        [(dates, ["order_dk"]), (dates, ["ship_dk"])],
        frames={
            f"{dates}#0": base.select(
                F.col("dk").alias("order_dk"),
                F.col("dname").alias("order_day"),
            ),
            f"{dates}#1": base.select(
                F.col("dk").alias("ship_dk"),
                F.col("dname").alias("ship_day"),
            ),
        },
    )
    assert sorted(plan["order"]) == [f"{dates}#0", f"{dates}#1"]
    got = joined.toPandas()
    assert len(got) == 900
    assert {"order_day", "ship_day"} <= set(got.columns)
    # the two roles carry DIFFERENT day names per row (offset 7)
    sample = got.iloc[0]
    assert sample["order_day"] == f"day-{sample['order_dk']}"
    assert sample["ship_day"] == f"day-{sample['ship_dk']}"
    assert (got["order_dk"] != got["ship_dk"]).all()


def test_analyze_statement_publishes_sidecars(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import dml
    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_partition_stats as _ips,
    )

    dim = str(tmp_path / "adim")
    iw.create_iceberg(
        spark.range(30).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("grp")
        ).coalesce(1),
        dim,
        partition_by=["grp"],
    )
    dml.execute_native_sql(
        spark,
        "ANALYZE TABLE d COMPUTE STATISTICS FOR COLUMNS k, grp",
        {"d": dim},
    )
    ndv = iw.column_ndv(dim)
    assert set(ndv) == {"k", "grp"}
    stats = _ips.read_partition_stats(spark, dim)
    assert stats.count() == 3
    # Delta side: ANALYZE backfills the crc aggregate
    fact = _fact(spark, tmp_path, n=100)
    import os

    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw2

    os.unlink(dw2.crc_path(fact, 0))
    dml.execute_native_sql(
        spark, "ANALYZE TABLE f COMPUTE STATISTICS", {"f": fact}
    )
    assert os.path.exists(dw2.crc_path(fact, 0))


def test_maintenance_publish_stats_phase(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.iceberg_maintenance import run_maintenance

    path = str(tmp_path / "mt")
    iw.create_iceberg(
        spark.range(40).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        ).repartition(6),
        path,
    )
    report = run_maintenance(
        spark, path, target_files=2, publish_stats=True
    )
    assert report["partition_stats"] is not None
    assert report["table_stats"] is not None
    prof = cbo.table_profile(spark, path)
    assert prof["ndv"]  # published for the post-maintenance snapshot


def test_totals_absent_after_dml_falls_back(spark, tmp_path):
    path = str(tmp_path / "d")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
    ).coalesce(1)
    iw.create_iceberg(df, path)
    from dst_spark_k8_lakehouse_spark.plans import iceberg_dml

    iceberg_dml.delete_iceberg(spark, path, "k < 3")
    prof = cbo.table_profile(spark, path)
    # the COW DML snapshot carries no totals -> the walk supplies
    # exact numbers instead of a stale chain
    assert prof["rows"] == 7


# ------------------------------------------- r11: cardinality + ordering


def test_estimate_join_rows_containment():
    # |A jn B| = |A|*|B| / max(ndv) per key, keys independent
    a = {"rows": 60000, "bytes": 1, "ndv": {"k": 2000.0, "j": 10.0}}
    b = {"rows": 400, "bytes": 1, "ndv": {"k": 400.0}}
    e = cbo.estimate_join_rows(a, b, ["k"])
    assert e["rows"] == 60000 * 400 / 2000.0
    assert e["assumed"] == []
    # multi-key: domains multiply
    b2 = {"rows": 400, "bytes": 1, "ndv": {"k": 400.0, "j": 4.0}}
    e2 = cbo.estimate_join_rows(a, b2, ["k", "j"])
    assert e2["rows"] == 60000 * 400 / (2000.0 * 10.0)


def test_estimate_join_rows_missing_ndv_fk_fallback():
    a = {"rows": 50000, "bytes": 1, "ndv": {}}
    b = {"rows": 100, "bytes": 1, "ndv": {}}
    e = cbo.estimate_join_rows(a, b, ["k"])
    # domain falls back to max(|A|,|B|): estimate = min side, never
    # the |A|*|B| explosion a missing denominator would produce
    assert e["rows"] == 100
    assert e["assumed"] == ["k"]


def test_order_joins_puts_selective_dim_first():
    fact = {"rows": 100000, "bytes": 10 << 20,
            "ndv": {"pk": 2000.0, "sk": 100.0}}
    supp = {"rows": 100, "bytes": 1000, "ndv": {"sk": 100.0}}
    part = {"rows": 400, "bytes": 4000, "ndv": {"pk": 400.0}}
    plan = cbo.order_joins(
        ("fact", fact),
        [("supplier", supp, ["sk"]), ("part", part, ["pk"])],
    )
    assert plan["order"] == ["part", "supplier"]
    by_dim = {s["dim"]: s for s in plan["steps"]}
    assert by_dim["part"]["est_rows"] == 100000 * 400 / 2000.0
    # the intermediate carries forward: supplier joins the SHRUNK side
    assert by_dim["supplier"]["est_rows"] == by_dim["part"]["est_rows"]
    # per-step advice is full advise_join output (broadcast both dims)
    assert all(s["advice"]["strategy"] == "broadcast"
               for s in plan["steps"])


def test_order_joins_deterministic_tiebreak():
    fact = {"rows": 1000, "bytes": 1 << 20, "ndv": {}}
    d1 = {"rows": 10, "bytes": 100, "ndv": {}}
    d2 = {"rows": 10, "bytes": 100, "ndv": {}}
    p1 = cbo.order_joins(("f", fact), [("b", d1, ["x"]), ("a", d2, ["y"])])
    p2 = cbo.order_joins(("f", fact), [("a", d2, ["y"]), ("b", d1, ["x"])])
    assert p1["order"] == p2["order"] == ["a", "b"]  # name tiebreak
