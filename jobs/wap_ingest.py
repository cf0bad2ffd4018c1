#!/usr/bin/env python
"""Batch job: WRITE-AUDIT-PUBLISH ingest into a native Iceberg table.

The production gate pattern (real Iceberg's ``spark.wap.branch``
workflow, here on the jar-free stack): a batch lands on a STAGING
BRANCH, a configurable audit suite runs against the branch read, and
only a clean audit fast-forwards main — consumers of main never see a
bad batch, and a failed audit leaves main byte-identical with the
quarantined branch intact for inspection.

  batch → append_iceberg(branch=…) → audits(read_iceberg(ref=…))
        → PASS: fast_forward("main", branch) [+ drop branch]
        → FAIL: main untouched; branch kept for inspection

Audits are ``(name, fn(DataFrame) -> bad_row_count)`` pairs — run on
the BRANCH read, so they see base+batch exactly as main would after
publish (cross-batch invariants like uniqueness hold, not just
per-batch ones). Built-in audits: ``not_null`` (columns), ``unique``
(key columns), ``min_rows``.

At 100 TB the costs are: one append (the batch's own bytes), the
audit scans (pushdown applies — a not-null audit on one column reads
one column), and a metadata-only publish. Nothing rewrites.
"""

from __future__ import annotations

import sys
import time
import uuid
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dst_spark_k8_lakehouse_spark.plans import (  # noqa: E402
    iceberg_reader,
    iceberg_writer,
)

Audit = tuple[str, Callable[[DataFrame], int]]


def not_null_audit(cols: list[str]) -> Audit:
    """Rows where ANY of ``cols`` is null are bad."""
    cond = " OR ".join(f"{c} IS NULL" for c in cols)
    return (f"not_null({', '.join(cols)})",
            lambda df: df.where(cond).count())


def unique_audit(keys: list[str]) -> Audit:
    """Key tuples appearing more than once (across base + batch —
    the branch read IS the post-publish state) are bad."""
    def _run(df: DataFrame) -> int:
        return (
            df.groupBy(*keys).count().where(F.col("count") > 1).count()
        )
    return (f"unique({', '.join(keys)})", _run)


def min_rows_audit(n: int) -> Audit:
    """A suspiciously small batch (upstream truncation) fails."""
    return (f"min_rows({n})", lambda df: int(df.limit(n).count() < n))


def run_wap_ingest(
    spark: SparkSession,
    table: str,
    batch: DataFrame,
    audits: list[Audit],
    branch: str | None = None,
    keep_branch_on_failure: bool = True,
    txn: tuple[str, int] | None = None,
) -> dict[str, Any]:
    """Stage → audit → publish. Returns the report dict:
    ``{"published": bool, "branch": str, "snapshot": int,
    "audits": {name: bad_count}, "main_rows_before": int,
    "elapsed_s": float}``. On audit failure main is untouched and
    (by default) the branch survives for inspection."""
    t0 = time.time()
    br = branch or f"wap-{uuid.uuid4().hex[:8]}"
    iceberg_writer.create_branch(table, br)
    try:
        snap = iceberg_writer.append_iceberg(
            batch, table, txn=txn, branch=br
        )
        if snap == -1:  # duplicate (app, epoch): already ingested
            iceberg_writer.drop_ref(table, br)
            return {
                "published": False, "branch": br, "snapshot": -1,
                "audits": {}, "duplicate_txn": True,
                "elapsed_s": time.time() - t0,
            }
        staged = iceberg_reader.read_iceberg(spark, table, ref=br)
        results = {name: int(fn(staged)) for name, fn in audits}
        main_before = iceberg_reader.read_iceberg(spark, table).count()
        if any(results.values()):
            if not keep_branch_on_failure:
                iceberg_writer.drop_ref(table, br)
            return {
                "published": False, "branch": br, "snapshot": snap,
                "audits": results, "main_rows_before": main_before,
                "elapsed_s": time.time() - t0,
            }
        iceberg_writer.fast_forward(table, "main", br)
        iceberg_writer.drop_ref(table, br)
        return {
            "published": True, "branch": br, "snapshot": snap,
            "audits": results, "main_rows_before": main_before,
            "elapsed_s": time.time() - t0,
        }
    except Exception:
        # a failed stage must not leak a half-set-up branch when the
        # append itself died (nothing to inspect)
        meta, _ = iceberg_writer._load_meta(table)
        refs = meta.get("refs") or {}
        if br in refs and int(refs[br]["snapshot-id"]) == int(
            meta.get("current-snapshot-id") or -1
        ):
            iceberg_writer.drop_ref(table, br)
        raise
