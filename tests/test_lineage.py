"""Local OpenLineage-shaped lineage (``lineage.py``): root
detection, input extraction from the public plan surface, event
shape, the NDJSON sink, and the live QueryExecutionListener."""

from __future__ import annotations

import os
import time

import pytest

from dst_spark_k8_lakehouse_spark import lineage

SF = "/root/testdata/sf0.001"


def test_table_root_detects_formats(tmp_path):
    delta = tmp_path / "dt"
    (delta / "_delta_log").mkdir(parents=True)
    (delta / "part-0.parquet").write_bytes(b"")
    root, fmt = lineage.table_root(str(delta / "part-0.parquet"))
    assert (root, fmt) == (str(delta), "delta")

    ice = tmp_path / "it"
    (ice / "metadata").mkdir(parents=True)
    (ice / "metadata" / "v1.metadata.json").write_text("{}")
    (ice / "data").mkdir()
    root, fmt = lineage.table_root(str(ice / "data" / "f.parquet"))
    assert (root, fmt) == (str(ice), "iceberg")

    root, fmt = lineage.table_root(f"file:{tmp_path}/plain.parquet")
    assert (root, fmt) == (f"{tmp_path}/plain.parquet", "parquet")


def test_extract_inputs_joins_dedupe_to_roots(spark):
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    df = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    )
    inputs = lineage.extract_inputs(df)
    names = {i["name"] for i in inputs}
    assert names == {
        f"{SF}/orders.parquet", f"{SF}/customer.parquet"
    }
    assert all(i["format"] == "parquet" for i in inputs)
    # a file-less frame reports NOTHING, not a guess
    assert lineage.extract_inputs(spark.range(5)) == []


def test_extract_inputs_native_tables(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans import (
        delta_reader,
        delta_writer,
    )
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    t = str(tmp_path / "dt")
    delta_writer.create_delta(
        load_table(spark, SF, "region").coalesce(1), t
    )
    inputs = lineage.extract_inputs(delta_reader.read_delta(spark, t))
    assert inputs == [
        {"namespace": "local", "name": t, "format": "delta"}
    ]


def test_event_shape_and_sink_roundtrip(tmp_path):
    sink = lineage.FileLineageSink(str(tmp_path / "lineage"))
    ev = lineage.lineage_event(
        "jobA",
        [{"namespace": "local", "name": "/x", "format": "parquet"}],
        [{"namespace": "local", "name": "/y", "format": "delta"}],
    )
    path = sink.write(ev)
    assert os.path.basename(path).startswith("events-")
    got = sink.read_events()
    assert len(got) == 1
    e = got[0]
    assert e["eventType"] == "COMPLETE"
    assert e["schemaURL"] == lineage.SCHEMA_URL
    assert e["job"] == {"namespace": "local", "name": "jobA"}
    assert e["inputs"][0]["name"] == "/x"
    assert e["outputs"][0]["facets"]["format"] == "delta"
    assert e["run"]["runId"]


def test_emit_reads_plan_inputs(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    sink = lineage.FileLineageSink(str(tmp_path / "lx"))
    ev = lineage.emit(
        load_table(spark, SF, "nation"),
        "nightly-load",
        sink,
        outputs=[{"namespace": "local", "name": "/out", "format": "delta"}],
    )
    assert ev["inputs"][0]["name"] == f"{SF}/nation.parquet"
    assert sink.read_events()[0]["outputs"][0]["name"] == "/out"


def test_listener_emits_per_action(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    sink = lineage.FileLineageSink(str(tmp_path / "ll"))
    try:
        listener = lineage.register_listener(spark, sink)
    except RuntimeError as exc:  # pragma: no cover - env-specific
        pytest.skip(f"callback server unavailable here: {exc}")
    try:
        load_table(spark, SF, "supplier").count()
        # listener bus delivers asynchronously: poll, bounded
        deadline = time.time() + 15
        events = []
        while time.time() < deadline:
            events = [
                e for e in sink.read_events()
                if any(
                    i["name"] == f"{SF}/supplier.parquet"
                    for i in e["inputs"]
                )
            ]
            if events:
                break
            time.sleep(0.25)
        assert events, "no lineage event arrived for the count action"
        e = events[0]
        assert e["eventType"] == "COMPLETE"
        assert e["job"]["name"].startswith("action:")
    finally:
        lineage.unregister_listener(spark, listener)


def test_listener_emits_outputs_for_writes(spark, tmp_path):
    """r12 (VERDICT r11 item 6): a df.write.parquet action under the
    live listener yields an event whose OUTPUTS carry the destination
    directory and format — writes are the lineage consumers' actual
    interest; through r11 the listener emitted inputs only."""
    from dst_spark_k8_lakehouse_spark.sources.catalog import load_table

    sink = lineage.FileLineageSink(str(tmp_path / "lo"))
    try:
        listener = lineage.register_listener(spark, sink)
    except RuntimeError as exc:  # pragma: no cover - env-specific
        pytest.skip(f"callback server unavailable here: {exc}")
    dest = str(tmp_path / "gold-out")
    try:
        load_table(spark, SF, "region").write.parquet(dest)
        deadline = time.time() + 15
        events = []
        while time.time() < deadline:
            events = [
                e for e in sink.read_events()
                if any(o["name"] == dest for o in e["outputs"])
            ]
            if events:
                break
            time.sleep(0.25)
        assert events, "no lineage event carried the write destination"
        e = events[0]
        assert e["eventType"] == "COMPLETE"
        out = [o for o in e["outputs"] if o["name"] == dest][0]
        assert out["facets"]["format"] == "parquet"
        # the read side still rides along
        assert any(
            i["name"] == f"{SF}/region.parquet" for i in e["inputs"]
        )
    finally:
        lineage.unregister_listener(spark, listener)


def test_output_dataset_ascends_into_native_tables(spark, tmp_path):
    """A parquet write landing INSIDE a Delta table (the engine's own
    data-file writes) must report the TABLE root with format delta,
    not the part directory; a plain directory write reports itself
    with the hinted format."""
    import pandas as pd

    from dst_spark_k8_lakehouse_spark.plans import delta_writer

    tbl = str(tmp_path / "dt")
    delta_writer.create_delta(
        spark.createDataFrame(pd.DataFrame({"a": [1, 2]})), tbl
    )
    inside = lineage.output_dataset(tbl, "parquet")
    assert inside == {
        "namespace": lineage.DEFAULT_NAMESPACE,
        "name": tbl,
        "format": "delta",
    }
    plain = lineage.output_dataset(str(tmp_path / "plain"), "csv")
    assert plain["name"] == str(tmp_path / "plain")
    assert plain["format"] == "csv"


def test_d74_query_survives_cached_catalog(spark):
    """The registry query must stay file-backed even when the session
    pinned the catalog caches (bench flow): cached handles correctly
    report no inputFiles, so d74 reads the parquet directly."""
    import dst_spark_k8_lakehouse_spark.sources.catalog as cat
    from dst_spark_k8_lakehouse_spark import registry

    registry.load_all()
    cat.cache_tables(spark, SF)
    try:
        got = registry.QUERIES["d74_lineage"](spark, SF).toPandas()
        assert sorted(got["dataset"]) == [
            "customer.parquet", "orders.parquet"
        ]
        assert got["event_ok"].all()
    finally:
        cat.uncache_tables(spark)


# --------------------------------------------------- native-commit hook


@pytest.fixture()
def commit_sink(tmp_path):
    """A watched sink, guaranteed unwatched afterwards (the watcher
    registry is process-global — a leak would pollute every later
    native write in the session)."""
    sink = lineage.FileLineageSink(str(tmp_path / "lineage"))
    lineage.watch_commits(sink)
    yield sink
    lineage.unwatch_commits(sink)


def _commit_events(sink):
    return [
        e for e in sink.read_events()
        if e["job"]["name"].startswith("commit:")
    ]


def test_append_delta_emits_commit_lineage(spark, tmp_path, commit_sink):
    """VERDICT r12 item 3: library writes must produce OUTPUT lineage
    without an explicit emit() — the listener path can't see native
    commits (no InsertIntoHadoopFsRelationCommand node)."""
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    tbl = str(tmp_path / "dt")
    dw.create_delta(spark.range(5), tbl)
    dw.append_delta(spark.range(5, 8), tbl)
    events = _commit_events(commit_sink)
    assert len(events) == 2  # create (v0) + append (v1)
    for e, version in zip(events, (0, 1)):
        (out,) = e["outputs"]
        assert out["name"] == tbl
        assert out["facets"]["format"] == "delta"
        assert out["facets"]["version"] == version
        assert e["eventType"] == "COMPLETE"
        assert e["inputs"] == []
    assert events[1]["outputs"][0]["facets"]["operation"] == "WRITE"


def test_stream_to_delta_emits_commit_lineage(spark, tmp_path, commit_sink):
    from pyspark.sql import functions as F

    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
    from dst_spark_k8_lakehouse_spark.streaming.delta_sink import (
        stream_to_delta,
    )

    src = str(tmp_path / "src")
    spark.range(10).withColumn("batch", F.lit(0)).coalesce(1) \
        .write.parquet(f"{src}/f0")
    tbl = str(tmp_path / "dt")
    dw.create_delta(spark.createDataFrame([], "id long, batch int"), tbl)
    q = stream_to_delta(
        spark.readStream.schema("id long, batch int").parquet(src + "/*"),
        tbl, str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    events = _commit_events(commit_sink)
    # one create + >=1 micro-batch append, every one naming the table
    assert len(events) >= 2
    assert all(e["outputs"][0]["name"] == tbl for e in events)
    assert all(
        e["outputs"][0]["facets"]["format"] == "delta" for e in events
    )
    versions = [e["outputs"][0]["facets"]["version"] for e in events]
    assert versions == sorted(versions) and versions[0] == 0


def test_delta_native_datasource_write_emits_commit_lineage(
    spark, tmp_path
):
    """The DataSource write face commits in Spark's Python-runner
    process, where the session's watch_commits registry is invisible
    — the sink location travels as the ``lineagedir`` write option."""
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
    from dst_spark_k8_lakehouse_spark.sources import delta_source

    delta_source.register(spark)
    tbl = str(tmp_path / "dt")
    ldir = str(tmp_path / "lineage")
    dw.create_delta(spark.range(3), tbl)
    spark.range(3, 6).write.format("delta_native").mode("append") \
        .option("lineagedir", ldir).save(tbl)
    events = _commit_events(lineage.FileLineageSink(ldir))
    assert len(events) == 1
    (out,) = events[0]["outputs"]
    assert out["name"] == tbl and out["facets"]["format"] == "delta"
    assert out["facets"]["version"] == 1
    assert out["facets"]["operation"] == "WRITE"


def test_iceberg_native_datasource_write_emits_commit_lineage(
    spark, tmp_path
):
    from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
    from dst_spark_k8_lakehouse_spark.sources import iceberg_source

    iceberg_source.register(spark)
    tbl = str(tmp_path / "it")
    ldir = str(tmp_path / "lineage")
    iw.create_iceberg(spark.range(3), tbl)
    spark.range(3, 6).write.format("iceberg_native").mode("append") \
        .option("lineagedir", ldir).save(tbl)
    events = _commit_events(lineage.FileLineageSink(ldir))
    assert len(events) == 1
    (out,) = events[0]["outputs"]
    assert out["name"] == tbl and out["facets"]["format"] == "iceberg"
    assert out["facets"]["version"] >= 1
    assert "snapshot_id" in out["facets"]


def test_append_iceberg_emits_commit_lineage(spark, tmp_path, commit_sink):
    from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw

    tbl = str(tmp_path / "it")
    iw.create_iceberg(spark.range(4), tbl)
    iw.append_iceberg(spark.range(4, 9), tbl)
    events = _commit_events(commit_sink)
    assert len(events) == 2
    for e in events:
        (out,) = e["outputs"]
        assert out["name"] == tbl
        assert out["facets"]["format"] == "iceberg"
    assert events[-1]["outputs"][0]["facets"]["version"] >= 1
    assert "snapshot_id" in events[-1]["outputs"][0]["facets"]


def test_commit_lineage_sink_error_never_fails_the_write(
    spark, tmp_path
):
    """The lineage contract: a broken sink is swallowed, the commit
    lands."""
    from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw

    class _Boom:
        def write(self, event):
            raise RuntimeError("sink down")

    boom = _Boom()
    lineage.watch_commits(boom)
    try:
        tbl = str(tmp_path / "dt")
        dw.create_delta(spark.range(3), tbl)
        assert spark.read.parquet(tbl).count() == 3
    finally:
        lineage.unwatch_commits(boom)
