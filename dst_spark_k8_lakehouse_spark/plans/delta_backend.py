"""Delta Lake backend for the versioned-table surface (guarded).

The reference's table layer is real Delta 3.2 / Iceberg 1.9
(``scripts/download-jars.sh:84-91``, ``getting_started.py:130-151``,
``03_delta_demo.ipynb:80-189``). This container cannot install
``delta-spark`` (verified), so the engine ships the parquet+manifest
``VersionedTable`` with equivalent semantics — but when the jars ARE
present (``session._lakehouse_extensions`` detects them and wires the
Catalyst extension), ``open_table`` below returns a Delta-backed
implementation of the same API instead, and every snapshot/time-travel/
DML call maps onto the native Delta transaction log:

| VersionedTable            | Delta mapping                           |
|---------------------------|-----------------------------------------|
| create/append/overwrite   | ``write.format("delta").mode(...)``     |
| read(version=N)           | ``option("versionAsOf", N)``            |
| history()                 | ``DeltaTable.history()``                |
| update/delete/merge       | ``DeltaTable.update/delete/merge``      |
| vacuum()                  | ``DeltaTable.vacuum()``                 |
| append props (stream txn) | ``option("txnAppId"/"txnVersion")``     |

Use ``open_table(spark, path)`` rather than naming a backend: callers
get Delta semantics wherever the runtime provides them and the
parquet-native fallback everywhere else, with identical call sites.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dst_spark_k8_lakehouse_spark.plans.table import VersionedTable


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

    def _write(self, df: DataFrame, mode: str, props: dict[str, Any] | None) -> int:
        writer = df.write.format("delta").mode(mode)
        if mode == "append":
            writer = writer.option("mergeSchema", "true")
        else:
            writer = writer.option("overwriteSchema", "true")
        if props and "stream_batch_id" in props:
            # Delta's idempotent-writes contract: same (appId, version)
            # pair commits at most once — the native form of
            # VersionedTable's stream_batch_id snapshot prop.
            writer = writer.option("txnAppId", props.get("app_id", self.path))
            writer = writer.option("txnVersion", int(props["stream_batch_id"]))
        writer.save(self.path)
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
        on: str,
        update_set: dict[str, str] | None = None,
        insert_values: dict[str, str] | None = None,
    ) -> int:
        m = self._dt().alias("t").merge(source.alias("s"), on)
        m = (
            m.whenMatchedUpdate(set=update_set)
            if update_set
            else m.whenMatchedUpdateAll()
        )
        m = (
            m.whenNotMatchedInsert(values=insert_values)
            if insert_values
            else m.whenNotMatchedInsertAll()
        )
        m.execute()
        return self._latest_version()

    def history(self) -> DataFrame:
        return (
            self._dt()
            .history()
            .selectExpr(
                "CAST(version AS INT) AS version",
                "CAST(timestamp AS LONG) * 1000 AS timestamp_ms",
                "upper(operation) AS operation",
            )
        )

    def vacuum(self, retain_hours: float = 168.0) -> list[str]:
        self._dt().vacuum(retain_hours)
        return []  # Delta logs removed files itself; nothing to report

    def committed_props(self, key: str) -> set[Any]:
        if key != "stream_batch_id":
            return set()
        from delta.tables import DeltaTable

        hist = DeltaTable.forPath(self.spark, self.path).history()
        # txnVersion surfaces in operationParameters for txn commits
        return {
            int(r["operationParameters"]["txnVersion"])
            for r in hist.collect()
            if (r["operationParameters"] or {}).get("txnVersion") is not None
        }


def open_table(
    spark: SparkSession, path: str
) -> VersionedTable | DeltaBackedTable:
    """The backend-agnostic entry point: native Delta when the runtime
    has the jars, parquet+manifest ``VersionedTable`` otherwise."""
    if delta_available():
        return DeltaBackedTable(spark, path)
    return VersionedTable(spark, path)
