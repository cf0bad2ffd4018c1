"""Testdata catalog: parquet tables as the engine's table layer.

The reference resolves tables through a Polaris REST catalog / Delta paths
(``docker/spark-notebook/connector.py:108-124``,
``getting_started.py:130-151``); locally the same surface is a directory of
parquet files registered as session-catalog views
(``spark.table(name)`` then works exactly like the reference's
``spark.table("polaris.demo.customers")``, ``05_datahub_lineage_demo
.ipynb:147``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Session-level cached tables, keyed (sf_dir, name) — populated only by
# an explicit cache_tables() call (bench / interactive sessions). The
# driver's correctness runs never populate it, so they always exercise
# the real parquet scan path.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (S1): columnar, predicate-pushdown + column-pruning
    capable — filters/projections applied downstream reach the reader.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader only accepts as a raw LONG via
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain TIMESTAMP(MICROS)
    (read natively as TIMESTAMP_NTZ). We adapt to whatever is on disk:

    * LONG nanos → rebuild a microsecond TIMESTAMP with exact integer
      division (a float division would lose precision — epoch-nanos
      exceed a double's 53-bit mantissa). Sub-microsecond residue is
      dropped; queries that emit event timestamps truncate to seconds
      on both engine and oracle sides.
    * TIMESTAMP / TIMESTAMP_NTZ → pass through unchanged. The session is
      pinned UTC (``session.py:86``), so NTZ values are bit-identical to
      the instants the old conversion produced, and NTZ matches the
      DuckDB oracle's naive-timestamp semantics under any driver session
      timezone.
    """
    hit = _TABLE_CACHE.get((sf_dir, name))
    if hit is not None:
        # guard against a cache populated by a stopped session: a
        # DataFrame bound to a dead SparkContext fails far from the
        # cause ("SparkContext has been shut down")
        if hit.sparkSession is spark:
            return hit
        _TABLE_CACHE.pop((sf_dir, name), None)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cache_tables(spark: SparkSession, sf_dir: str) -> None:
    """Materialize every table once as a repartitioned, memory-cached
    DataFrame — the local stand-in for a cluster's parallel scan.

    The driver-generated testdata is 1 row group per file, so a cold
    ``spark.read.parquet`` plans 1-2 tasks no matter how many cores the
    session has: every downstream query starts from a serial scan. A
    1000-executor cluster reading 100 TB has thousands of splits and
    never hits this; locally we recover the parallelism by repartitioning
    each table to ~20k-row partitions (capped at core count; tiny dims
    stay single-partition — they broadcast anyway) and pinning the
    columnar cache. Subsequent ``load_table`` calls serve the cached
    plan; filters still prune via in-memory batch stats."""
    par = spark.sparkContext.defaultParallelism
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        # Partition-count policy is per-WORKLOAD-CLASS, not one
        # rows-per-partition constant:
        # * compute-bound tables (documents → tokenization/hashing,
        #   events → JSON parse/windowing, embeddings → vector math)
        #   keep ~20k rows/partition (embeddings full fan-out) — their
        #   queries spend CPU per row, so cores are the unit.
        # * relational tables (lineitem/orders/…) take ~60k
        #   rows/partition: their queries are scan+broadcast-join+agg
        #   bound, where per-task scheduling is the marginal cost —
        #   3× fewer tasks per join stage measured 10-30% off the
        #   star-join family (j8/x1/x2, consistent sign across four
        #   interleaved A/B runs) with no reproducible regression
        #   elsewhere. (Full 32-way fan-out on small tables regresses
        #   the bench ~50% — measured r2.) Tiny dims stay
        #   single-partition; they broadcast anyway.
        if name == "embeddings":
            n = par
        elif name in ("documents", "events"):
            n = max(1, min(par, df.count() // 20_000))
        else:
            n = max(1, min(par, df.count() // 60_000))
        cached = (df.repartition(n) if n > 1 else df.coalesce(1)).cache()
        cached.count()  # pin before queries run
        _TABLE_CACHE[(sf_dir, name)] = cached


def uncache_tables(spark: SparkSession) -> None:
    """Drop every pinned table cache (test hygiene)."""
    for df in _TABLE_CACHE.values():
        df.unpersist()
    _TABLE_CACHE.clear()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (catalog-scan surface,
    S9/D2/D3: ``spark.table``, SHOW TABLES, DESCRIBE all work)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
