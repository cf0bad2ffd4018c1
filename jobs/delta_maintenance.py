#!/usr/bin/env python
"""Operational maintenance job for a NATIVE Delta table — the nightly
run every streaming-ingested table needs (the per-micro-batch sink
leaves one small file and one log commit per batch):

  checkpoint  →  log replay becomes O(live files), not O(history)
  compact     →  small files bin-packed (dataChange=false; streams
                 and time travel see through it)
  vacuum      →  tombstoned + orphaned data files reclaimed past the
                 version-retention horizon

Usage::

    spark-submit jobs/delta_maintenance.py <table> [retain_versions]

The run is idempotent and safe to schedule: every step is a no-op when
there is nothing to do, and a concurrent writer losing a race at most
forces this job's retry (documented in ``plans/delta_writer``).
"""

from __future__ import annotations

import os
import sys
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from dst_spark_k8_lakehouse_spark.plans import delta_reader, delta_writer  # noqa: E402


def table_health(spark: SparkSession, table: str) -> dict[str, Any]:
    """Live-state snapshot: file count/bytes, commit count, txn apps —
    the numbers a maintenance dashboard plots per table."""
    state = delta_reader._replay(spark, table, None)
    files = state["files"]
    commits = delta_reader._commit_files(table)
    cp = delta_reader._checkpoint(table)
    dvs = [
        a["deletionVector"]
        for a in files.values()
        if a.get("deletionVector")
    ]
    return {
        "n_files": len(files),
        "total_bytes": sum(int(a["size"]) for a in files.values()),
        "n_commits": len(commits),
        "last_version": commits[-1][0] if commits else (
            cp[0] if cp else -1
        ),
        "checkpoint_version": cp[0] if cp else None,
        "txn_apps": sorted(state["txns"]),
        "partition_columns": state["metaData"].get("partitionColumns")
        or [],
        "vectored_files": len(dvs),
        "dv_deleted_rows": sum(int(d["cardinality"]) for d in dvs),
    }


def run_maintenance(
    spark: SparkSession,
    table: str,
    retain_versions: int = 2,
    target_files: int | None = None,
) -> dict[str, Any]:
    """Checkpoint → compact → checkpoint-again → vacuum; returns a
    before/after health report plus what each step did. The second
    checkpoint makes the compaction the replay baseline, so the
    subsequent vacuum can reclaim the pre-compaction files once they
    leave the retention window."""
    before = table_health(spark, table)
    # deletion vectors must fold into plain files before a raw-file
    # compaction is legal (compact_delta refuses over live DVs)
    materialized_version = -1
    if before["vectored_files"]:
        from dst_spark_k8_lakehouse_spark.plans import delta_dv

        materialized_version = delta_dv.materialize_dvs(spark, table)
    cp1 = delta_writer.write_checkpoint(spark, table)
    compacted_version = delta_writer.compact_delta(
        spark, table, target_files=target_files
    )
    if compacted_version >= 0:
        delta_writer.write_checkpoint(spark, table)
    removed = delta_writer.vacuum_delta(
        spark, table, retain_versions=retain_versions
    )
    after = table_health(spark, table)
    return {
        "before": before,
        "after": after,
        "checkpointed_version": cp1,
        "materialized_version": materialized_version,
        "compacted_version": compacted_version,
        "n_vacuumed": len(removed),
    }


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: delta_maintenance.py <table> [retain_versions]"
        )
    from dst_spark_k8_lakehouse_spark import get_session

    spark = get_session(app_name="delta-maintenance")
    report = run_maintenance(
        spark,
        sys.argv[1],
        retain_versions=int(sys.argv[2]) if len(sys.argv) > 2 else 2,
    )
    import json

    print(json.dumps(report))


if __name__ == "__main__":
    main()
