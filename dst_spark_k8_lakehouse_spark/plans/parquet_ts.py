"""Parquet timestamp encoding for native-table data files.

Spark's default parquet timestamp encoding is INT96 (a deprecated
Impala-era compatibility type). INT96 columns carry NO usable
column-chunk statistics — pyarrow reports ``statistics.has_min_max ==
False`` — so every footer-derived stats surface silently loses
timestamp columns: Delta per-add ``stats`` (D46 data skipping) and
Iceberg manifest ``lower_bounds``/``upper_bounds`` (D47) both go blind
on exactly the column a 100 TB time-series table filters on most.

It is also a spec-parity issue: Iceberg requires timestamps as
parquet INT64 micros (spec "Parquet — Data Type Mappings"); Delta's
protocol checkpoint/stats examples assume annotated int64 timestamps
too. Real writers (Iceberg's parquet writer, delta-spark) never emit
INT96.

Every native-table data-file write therefore goes through
``timestamp_micros_writes`` — a save/restore of
``spark.sql.parquet.outputTimestampType`` around the staging write
(the DataFrameWriter ``option`` spelling is ignored by Spark for this
key; only the SQL conf takes effect).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KEY = "spark.sql.parquet.outputTimestampType"


@contextmanager
def timestamp_micros_writes(spark: SparkSession):
    """Force INT64-micros parquet timestamps for writes in scope."""
    try:
        old = spark.conf.get(_KEY)
    except Exception:
        old = None
    spark.conf.set(_KEY, "TIMESTAMP_MICROS")
    try:
        yield
    finally:
        if old is None:
            try:
                spark.conf.unset(_KEY)
            except Exception:
                pass
        else:
            spark.conf.set(_KEY, old)
