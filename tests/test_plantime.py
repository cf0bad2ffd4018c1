"""PLANTIME tracker (``plans/plantime.py``): the synthetic
metadata-only tables must be plannable by both native readers, the
pruned file sets must be exact, and the Iceberg pruned plan must skip
whole manifests unopened (the r8 manifest-level tier this tracker
exists to watch)."""

from __future__ import annotations

import datetime
import os

from dst_spark_k8_lakehouse_spark.plans import (
    avro_codec,
    delta_reader,
    iceberg_reader,
    plantime,
)


def test_synthetic_delta_plans_and_prunes(spark, tmp_path):
    t = str(tmp_path / "d")
    plantime.build_delta(t, 200, 5)
    full = delta_reader.plan_file_list(spark, t)
    assert len(full["files"]) == 200
    preds = [("ts", ">=", plantime._PRUNE_LO),
             ("ts", "<", plantime._PRUNE_HI)]
    pruned = delta_reader.plan_file_list(spark, t, predicates=preds)
    # 3 of 100 days, 2 files per day at N=200
    assert len(pruned["files"]) == 6
    # the kept adds' stats all intersect the range
    for a in pruned["files"].values():
        assert a["partitionValues"]["ds"] >= "2024-02-10"
        assert a["partitionValues"]["ds"] < "2024-02-13"


def test_synthetic_iceberg_plans_and_prunes(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "i")
    plantime.build_iceberg(t, 200, 5)
    full = iceberg_reader.plan_file_list(spark, t)
    assert len(full["data"]) == 200
    opened: list[str] = []
    orig = avro_codec.read_avro_file

    def spy(path, *a, **k):
        opened.append(os.path.normpath(path))
        return orig(path, *a, **k)

    monkeypatch.setattr(avro_codec, "read_avro_file", spy)
    preds = [("ts", ">=", plantime._PRUNE_LO),
             ("ts", "<", plantime._PRUNE_HI)]
    pruned = iceberg_reader.plan_file_list(spark, t, predicates=preds)
    assert len(pruned["data"]) == 6
    days = {
        (datetime.date(1970, 1, 1) +
         datetime.timedelta(days=e["pv"]["ts_day"])).isoformat()
        for e in pruned["data"]
    }
    assert days == {"2024-02-10", "2024-02-11", "2024-02-12"}
    # manifest-level pruning: each of the 5 commits spans ~20 days;
    # a 3-day range lives in ONE commit's band → 1 manifest opened
    manifests = [p for p in opened if "/m-" in p]
    assert len(manifests) == 1


def test_measure_shape(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PLANTIME_DIR", str(tmp_path / "pt"))
    monkeypatch.setattr(
        plantime, "SCALES", [("tiny", 100, 4)], raising=True
    )
    out = plantime.measure(spark)
    assert set(out) == {"tiny"}
    for fmt in ("delta", "iceberg"):
        m = out["tiny"][fmt]
        assert m["files_total"] == 100
        assert 0 < m["files_kept"] < 100
        assert m["full_s"] > 0 and m["pruned_s"] > 0
