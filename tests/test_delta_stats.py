"""Delta DATA SKIPPING: footer-derived per-add ``stats`` JSON
(numRecords/minValues/maxValues/nullCount — the spec's shape), file
pruning from ``read_delta(predicates=…)`` on ANY column, composition
with ZORDER (tight per-file spans → real skipping), checkpoint
carry-through, and the conservative keep rules."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw


def _df(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id").cast("double") / 2).alias("x"),
        F.concat(F.lit("w"), F.lpad(F.col("id").cast("string"), 6, "0"))
        .alias("s"),
    )


def test_adds_carry_spec_shaped_stats(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark).repartitionByRange(4, "id"), table)
    state = dr._replay(spark, table, None)
    for a in state["files"].values():
        s = json.loads(a["stats"])
        assert set(s) == {"numRecords", "minValues", "maxValues",
                          "nullCount"}
        assert s["numRecords"] > 0
        assert 0 <= s["minValues"]["id"] <= s["maxValues"]["id"]
        assert s["minValues"]["s"].startswith("w")
    total = sum(
        json.loads(a["stats"])["numRecords"]
        for a in state["files"].values()
    )
    assert total == 1000


def test_predicates_skip_files_on_unpartitioned_column(spark, tmp_path):
    table = str(tmp_path / "t")
    # range-partitioned layout → disjoint id spans per file
    dw.create_delta(_df(spark).repartitionByRange(8, "id"), table)
    got = dr.read_delta(spark, table, predicates=[("id", "<", 100)])
    assert {r.id for r in got.collect()} == set(range(100))
    assert len(got.inputFiles()) < 8
    got2 = dr.read_delta(
        spark, table, predicates=[("id", ">=", 900), ("id", "<", 950)]
    )
    assert got2.count() == 50
    assert len(got2.inputFiles()) == 1
    # string bounds skip too
    got3 = dr.read_delta(
        spark, table, predicates=[("s", "<", "w000100")]
    )
    assert got3.count() == 100
    assert len(got3.inputFiles()) < 8
    # equality + in
    got4 = dr.read_delta(spark, table, predicates=[("id", "==", 7)])
    assert [r.id for r in got4.collect()] == [7]
    assert len(got4.inputFiles()) == 1
    got5 = dr.read_delta(
        spark, table, predicates=[("id", "in", [3, 990])]
    )
    assert {r.id for r in got5.collect()} == {3, 990}
    assert len(got5.inputFiles()) == 2


def test_skipping_composes_with_zorder(spark, tmp_path):
    """ZORDER tightens per-file spans; the rewritten adds carry fresh
    stats, so a range predicate afterwards touches fewer files."""
    table = str(tmp_path / "t")
    # write INTERLEAVED so pre-zorder spans are all full-range
    dw.create_delta(
        _df(spark, 2000).repartition(8, "grp"), table
    )
    before = dr.read_delta(
        spark, table, predicates=[("id", "<", 200)]
    )
    n_before = len(before.inputFiles())
    dw.zorder_delta(spark, table, ["id"], n_files=8)
    after = dr.read_delta(
        spark, table, predicates=[("id", "<", 200)]
    )
    assert {r.id for r in after.collect()} == set(range(200))
    assert len(after.inputFiles()) < n_before


def test_stats_survive_checkpoint(spark, tmp_path):
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark).repartitionByRange(4, "id"), table)
    dw.write_checkpoint(spark, table)
    # force replay THROUGH the checkpoint: append one more commit
    # (out-of-range rows, so the new file's bounds exclude it too)
    dw.append_delta(
        spark.range(2000, 2010).select(
            "id", F.lit(1).cast("int").alias("grp"),
            F.lit(0.0).alias("x"), F.lit("w9").alias("s"),
        ).coalesce(1),
        table,
    )
    state = dr._replay(spark, table, None)
    assert all(a.get("stats") for a in state["files"].values())
    got = dr.read_delta(spark, table, predicates=[("id", "<", 10)])
    assert got.count() == 10
    assert len(got.inputFiles()) == 1


def test_timestamp_bounds_skip(spark, tmp_path):
    table = str(tmp_path / "t")
    rows = [
        (i, datetime.datetime(2024, 5, 1) + datetime.timedelta(hours=i))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    dw.create_delta(df.repartitionByRange(5, "ts"), table)
    lo = datetime.datetime(2024, 5, 3)
    hi = datetime.datetime(2024, 5, 4)
    got = dr.read_delta(
        spark, table, predicates=[("ts", ">=", lo), ("ts", "<", hi)]
    )
    want = {i for i, t in rows if lo <= t < hi}
    assert {r.id for r in got.collect()} == want
    assert len(got.inputFiles()) < 5


def test_missing_stats_keep_files(spark, tmp_path):
    """An add without stats (older writer) must never be skipped."""
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark, 100).coalesce(1), table)
    # strip the stats from the log by rewriting the commit
    import os

    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = []
    with open(log) as fh:
        for line in fh:
            d = json.loads(line)
            if "add" in d:
                d["add"].pop("stats", None)
            lines.append(json.dumps(d))
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    got = dr.read_delta(spark, table, predicates=[("id", "==", 5)])
    assert [r.id for r in got.collect()] == [5]
    assert len(got.inputFiles()) == 1  # kept (the only file)


def test_datasource_pushdown_stats_skipping(spark, tmp_path):
    """format('delta_native') skips files from plain DataFrame range
    filters via the pushed-filter stats check — no special API."""
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    table = str(tmp_path / "t")
    dw.create_delta(_df(spark).repartitionByRange(8, "id"), table)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = delta_source._BatchReader(table, None)
    n_all = len(r.partitions())
    list(r.pushFilters([
        GreaterThanOrEqual(("id",), 100), LessThan(("id",), 200),
    ]))
    assert 0 < len(r.partitions()) < n_all
    got = (
        spark.read.format("delta_native").load(table)
        .where((F.col("id") >= 100) & (F.col("id") < 200))
    )
    assert {r_.id for r_ in got.collect()} == set(range(100, 200))


def test_tz_aware_footer_stats_normalize_to_naive_utc(tmp_path):
    """r8 ADVICE fix (medium): pyarrow returns TZ-AWARE datetimes for
    tz-annotated timestamp columns (what the delta_native Arrow writer
    produces); the stats JSON must render them naive-UTC so they
    compare correctly with naive predicate literals — an ISO string
    with '+00:00' misorders prefix-ties and a ``<=`` at the exact file
    min would silently prune a matching file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    lo = datetime.datetime(2024, 3, 1, 12, 0, 0)
    hi = datetime.datetime(2024, 3, 2, 18, 30, 0)
    t = pa.table({
        "ts": pa.array([lo, hi], type=pa.timestamp("us", tz="UTC")),
        "v": pa.array([1, 2], type=pa.int64()),
    })
    p = str(tmp_path / "tz.parquet")
    pq.write_table(t, p)
    s = json.loads(dw._file_stats_json(p))
    assert s["minValues"]["ts"] == "2024-03-01 12:00:00"
    assert "+" not in s["minValues"]["ts"]
    add = {"stats": json.dumps(s)}
    # <= at the exact file min must KEEP the file (it has a match)
    assert dr._stats_keep(add, [("ts", "<=", lo)])
    assert dr._stats_keep(add, [("ts", ">=", hi)])
    assert not dr._stats_keep(
        add, [("ts", "<", lo - datetime.timedelta(seconds=1))]
    )
    # tz-aware literals normalize the same way on the reader side
    aware = lo.replace(tzinfo=datetime.timezone.utc)
    assert dr._stats_literal(aware) == "2024-03-01 12:00:00"


def test_stats_keep_is_superset_randomized():
    """Property: `_stats_keep` may only SKIP files whose stats PROVE
    no row matches — randomized over value types (ints, floats,
    strings, naive AND tz-aware datetimes — the r8 ADVICE area),
    predicate ops, and stats presence. For every generated file we
    also materialize concrete rows inside the stats bounds and check
    that a kept==False verdict never hides a matching row."""
    import random

    rnd = random.Random(80802)

    def rand_val(kind):
        if kind == "int":
            return rnd.randrange(-1000, 1000)
        if kind == "float":
            return round(rnd.uniform(-100, 100), 3)
        if kind == "str":
            return "".join(rnd.choice("abcxyz") for _ in range(3))
        base = datetime.datetime(2024, 3, 1) + datetime.timedelta(
            minutes=rnd.randrange(0, 50_000)
        )
        if rnd.random() < 0.5:
            return base
        return base.replace(tzinfo=datetime.timezone.utc)

    def norm(v):
        # the domain rows live in (naive UTC)
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        return v

    ops = ["==", "<", "<=", ">", ">=", "in"]
    for trial in range(400):
        kind = rnd.choice(["int", "float", "str", "dt"])
        vals = sorted(
            (norm(rand_val(kind)) for _ in range(rnd.randrange(1, 6))),
            key=repr if kind == "str" else lambda x: x,
        )
        lo, hi = min(vals), max(vals)
        stats = json.dumps({
            "numRecords": len(vals),
            "minValues": {"c": (
                lo.isoformat(sep=" ") if isinstance(lo, datetime.datetime)
                else lo)},
            "maxValues": {"c": (
                hi.isoformat(sep=" ") if isinstance(hi, datetime.datetime)
                else hi)},
            "nullCount": {"c": 0},
        })
        add = {"stats": stats}
        preds = []
        for _ in range(rnd.randrange(1, 3)):
            op = rnd.choice(ops)
            lit = ([rand_val(kind), rand_val(kind)] if op == "in"
                   else rand_val(kind))
            preds.append(("c", op, lit))
        if dr._stats_keep(add, preds):
            continue  # kept: always safe
        # pruned: NO value in the file may satisfy every predicate
        for v in vals:
            ok = True
            for _c, op, lit in preds:
                lits = [norm(x) for x in lit] if op == "in" else norm(lit)
                try:
                    if op == "in":
                        ok = ok and v in lits
                    elif op in ("==", "="):
                        ok = ok and v == lits
                    elif op == "<":
                        ok = ok and v < lits
                    elif op == "<=":
                        ok = ok and v <= lits
                    elif op == ">":
                        ok = ok and v > lits
                    elif op == ">=":
                        ok = ok and v >= lits
                except TypeError:
                    ok = False
                if not ok:
                    break
            assert not ok, (
                f"trial {trial}: pruned file contains matching value "
                f"{v!r} under {preds}"
            )
