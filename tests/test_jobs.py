"""The spark-submit-able job (reference entry point 3) runs end-to-end:
gold output written, metrics logged with a completion event."""

from __future__ import annotations

from dst_spark_k8_lakehouse_spark.plans import VersionedTable
from jobs.revenue_report import run


def test_revenue_report_job(spark, sf_dir, tmp_path):
    out = str(tmp_path / "gold")
    n = run(spark, sf_dir, out)
    assert n == 25  # one row per nation

    report = spark.read.parquet(f"{out}/revenue_by_nation")
    assert set(report.columns) == {"region", "nation", "revenue", "n_items"}

    log = VersionedTable(spark, f"{out}/_activity_log").read()
    by_fn = {r.metric_function: r for r in log.collect()}
    assert by_fn["count"].metric_value == 25.0
    assert by_fn["completion"].status == "success"
    assert log.count() == 2  # one batched commit, two events


def test_curate_corpus_job(spark, sf_dir, tmp_path):
    from jobs.curate_corpus import run as curate

    out = str(tmp_path / "curated")
    counts = curate(spark, sf_dir, out)
    assert 0 < counts["gold_docs"] <= counts["silver_docs"] <= counts["bronze_docs"]

    corpus = VersionedTable(spark, f"{out}/corpus").read()
    sigs = VersionedTable(spark, f"{out}/signatures").read()
    assert corpus.count() == counts["gold_docs"]
    assert sigs.count() == counts["gold_docs"]  # state matches corpus

    log = VersionedTable(spark, f"{out}/_activity_log").read()
    assert log.count() == 4  # 3 layer counts + completion, one commit
    assert (
        log.filter("metric_function = 'completion'").collect()[0].status
        == "success"
    )
    stats = spark.read.parquet(f"{out}/stats")
    assert stats.count() > 0
