"""Delta Lake backend for the versioned-table surface (guarded).

The reference's table layer is real Delta 3.2 / Iceberg 1.9
(``scripts/download-jars.sh:84-91``, ``getting_started.py:130-151``,
``03_delta_demo.ipynb:80-189``). This container cannot install
``delta-spark`` (verified), so the engine ships the parquet+manifest
``VersionedTable`` with equivalent semantics — but when the jars ARE
present (``session._lakehouse_extensions`` detects them and wires the
Catalyst extension), ``open_table`` below returns a Delta-backed
implementation of the SAME call surface, and every snapshot/
time-travel/DML call maps onto the native Delta transaction log:

| VersionedTable            | Delta mapping                           |
|---------------------------|-----------------------------------------|
| create/append/overwrite   | ``write.format("delta").mode(...)``     |
| read(version=N)           | ``option("versionAsOf", N)``            |
| history()                 | ``DeltaTable.history()``, ops mapped    |
| update/delete             | ``DeltaTable.update/delete``            |
| merge(source, on=[keys])  | ``DeltaTable.merge`` (condition built)  |
| vacuum()                  | ``DeltaTable.vacuum()`` — see note      |
| append props (stream txn) | ``txnAppId``/``txnVersion`` + sidecar   |

API-compatibility notes (enforced, not aspirational):

- ``merge`` takes the SAME ``(source, on: list[str],
  update_when_matched, insert_when_not_matched)`` signature as
  ``VersionedTable.merge`` and performs the same duplicate-source-key
  check; the Delta join condition is built from the key list.
- ``vacuum`` is the one semantic divergence the formats force:
  snapshot-count retention (parquet manifest) vs hour-based retention
  (Delta). Both are KEYWORD-ONLY (``retain_last=`` vs
  ``retain_hours=``) so a call written for one backend fails loudly on
  the other instead of silently reinterpreting a positional number.
- ``committed_props("stream_batch_id")`` works on both backends: Delta
  does NOT surface ``txn`` actions through DESCRIBE HISTORY, so this
  backend also records stream batch ids in a ``_stream_txns.json``
  sidecar (atomic rename, like the manifest). The native
  ``txnAppId/txnVersion`` options are STILL set — Delta itself skips a
  replayed (appId, version) commit, so idempotence holds even if the
  sidecar is lost; the sidecar only answers the lookup.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dst_spark_k8_lakehouse_spark.plans.table import VersionedTable

_TXN_SIDECAR = "_stream_txns.json"


def delta_available() -> bool:
    """True iff the delta-spark package (and its jars) import cleanly."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaBackedTable:
    """``VersionedTable``-compatible surface over a native Delta table.

    Only constructed when ``delta_available()``; all imports of the
    ``delta`` package stay inside methods so this module always imports.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- internals ---------------------------------------------------
    def _dt(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def _txn_path(self) -> str:
        return os.path.join(self.path, _TXN_SIDECAR)

    def _record_txn(self, batch_id: Any) -> None:
        ids = sorted({*self._txn_ids(), batch_id})
        tmp = self._txn_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(ids, f)
        os.replace(tmp, self._txn_path())

    def _txn_ids(self) -> set[Any]:
        if not os.path.exists(self._txn_path()):
            return set()
        with open(self._txn_path()) as f:
            return set(json.load(f))

    def _write(self, df: DataFrame, mode: str, props: dict[str, Any] | None) -> int:
        writer = df.write.format("delta").mode(mode)
        if mode == "append":
            writer = writer.option("mergeSchema", "true")
        else:
            writer = writer.option("overwriteSchema", "true")
        batch_id = (props or {}).get("stream_batch_id")
        if batch_id is not None:
            # Delta's idempotent-writes contract: same (appId, version)
            # commits at most once even on replay.
            writer = writer.option(
                "txnAppId", str((props or {}).get("app_id", self.path))
            ).option("txnVersion", int(batch_id))
        writer.save(self.path)
        if batch_id is not None:
            self._record_txn(batch_id)
        return self._latest_version()

    def _latest_version(self) -> int:
        return int(self._dt().history(1).head().version)

    # -- VersionedTable API ------------------------------------------
    def create(self, df: DataFrame, props: dict[str, Any] | None = None) -> int:
        return self._write(df, "overwrite", props)

    def append(self, df: DataFrame, props: dict[str, Any] | None = None) -> int:
        return self._write(df, "append", props)

    def overwrite(self, df: DataFrame, props: dict[str, Any] | None = None) -> int:
        return self._write(df, "overwrite", props)

    def read(self, version: int | None = None) -> DataFrame:
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def update(self, condition: str, assignments: dict[str, str]) -> int:
        self._dt().update(condition=condition, set=assignments)
        return self._latest_version()

    def delete(self, condition: str) -> int:
        self._dt().delete(condition=condition)
        return self._latest_version()

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        update_when_matched: bool = True,
        insert_when_not_matched: bool = True,
    ) -> int:
        """Same signature and semantics as ``VersionedTable.merge``:
        key-list join, unique-source-key requirement, update-all /
        insert-all behavior toggles."""
        dup_keys = (
            source.groupBy(*on).count().where("count > 1").limit(1).count()
        )
        if dup_keys:
            raise ValueError("MERGE source has duplicate keys")
        cond = " AND ".join(f"t.{k} = s.{k}" for k in on)
        m = self._dt().alias("t").merge(source.alias("s"), cond)
        if update_when_matched:
            m = m.whenMatchedUpdateAll()
        if insert_when_not_matched:
            m = m.whenNotMatchedInsertAll()
        m.execute()
        return self._latest_version()

    def history(self) -> DataFrame:
        """Same shape as ``VersionedTable.history`` (version,
        timestamp_ms, operation, n_files), with Delta operation names
        mapped onto the manifest vocabulary (WRITE+Append → APPEND,
        first WRITE → CREATE, …) and n_files from operationMetrics."""
        from pyspark.sql import functions as F

        hist = self._dt().history()
        mode = F.col("operationParameters").getItem("mode")
        op = (
            F.when(
                (F.col("operation") == "WRITE") & (mode == "Append"), "APPEND"
            )
            .when(
                (F.col("operation") == "WRITE") & (F.col("version") == 0),
                "CREATE",
            )
            .when(F.col("operation") == "WRITE", "OVERWRITE")
            .otherwise(F.upper(F.col("operation")))
        )
        return hist.select(
            F.col("version").cast("int").alias("version"),
            (F.col("timestamp").cast("long") * 1000).alias("timestamp_ms"),
            op.alias("operation"),
            F.col("operationMetrics")
            .getItem("numFiles")
            .cast("int")
            .alias("n_files"),
        )

    def vacuum(self, *, retain_hours: float = 168.0) -> list[str]:
        """Hour-based retention (the Delta contract) — keyword-only so a
        parquet-backend ``vacuum(retain_last=…)`` call fails loudly here
        rather than silently meaning something else."""
        self._dt().vacuum(retain_hours)
        return []  # Delta logs removed files itself; nothing to report

    def zorder(self, cols: list[str], n_files: int = 8) -> int:
        """API parity with ``VersionedTable.zorder``: delegate to
        Delta's own ``OPTIMIZE … ZORDER BY`` (executeZOrderBy), which
        owns the file-size targeting — ``n_files`` is accepted for
        signature parity and ignored (Delta sizes output files from
        ``optimize.maxFileSize``, the correct knob on that backend)."""
        if not cols or len(cols) > 4:
            raise ValueError("zorder needs 1-4 columns")
        self._dt().optimize().executeZOrderBy(*cols)
        return self._latest_version()

    def committed_props(self, key: str) -> set[Any]:
        if key != "stream_batch_id":
            return set()
        return self._txn_ids()

    def latest_prop(self, key: str, default: Any = None) -> Any:
        """API parity with ``VersionedTable.latest_prop``. Delta carries
        arbitrary commit metadata only via ``commitInfo.userMetadata``,
        which this backend doesn't write; stream txn ids live in `txn`
        actions and are set-valued by design. So: no scalar props."""
        return default


def open_table(
    spark: SparkSession, path: str
) -> VersionedTable | DeltaBackedTable:
    """The backend-agnostic entry point: native Delta when the runtime
    has the jars, parquet+manifest ``VersionedTable`` otherwise.

    Jar-less sessions can still SELECT from an EXISTING Delta table
    (one written by a real Delta runtime elsewhere): use
    ``read_existing_delta`` — ``open_table`` stays a read-write
    surface and refuses to silently wrap a Delta table it cannot
    write."""
    if delta_available():
        return DeltaBackedTable(spark, path)
    from dst_spark_k8_lakehouse_spark.plans import delta_reader

    if delta_reader.is_delta_table(path):
        raise ValueError(
            f"{path} is a Delta table but the Delta runtime is not "
            "installed — use read_existing_delta(spark, path) for "
            "read-only access, or install delta-spark to write"
        )
    return VersionedTable(spark, path)


def read_existing_delta(
    spark: SparkSession, path: str, version: int | None = None
):
    """Read-only SELECT (optionally time travel) from a Delta table
    without the Delta runtime — the pure-Python log reader
    (``delta_reader.read_delta``); with jars present, the native
    reader path."""
    if delta_available():
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(path)
    from dst_spark_k8_lakehouse_spark.plans import delta_reader

    return delta_reader.read_delta(spark, path, version)
