"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (on in ``session.py``) handles most hot keys
at runtime by splitting oversized shuffle partitions. Two cases it does
NOT cover, provided here as explicit rewrites:

- **salted aggregation**: a groupBy where one key holds a large share of
  all rows still funnels that key's rows into one reducer. Two-level
  aggregation (salt → partial agg → unsalt → final agg) caps any
  reducer's input at ~1/salt of the hot key. Only works for
  decomposable aggregates (sum/count/min/max — avg via sum+count).
- **salted join**: a shuffle join where the *left* side has hot keys and
  the right side is too big to broadcast outright. Salt the left key
  with ``pmod(hash(row), n)``, explode the right side ×n so every salt
  bucket finds its match — right-side duplication buys left-side
  balance (classic trade; n stays small, 8-16).

Both rewrites are deterministic (salt comes from column hashes, not
RNG), so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_keys: list[str],
    aggs: dict[str, tuple[Column, object]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-level skew-safe aggregation for decomposable aggregates.

    ``aggs`` maps output name → (partial aggregate expression, refold
    function applied to the partials): counts refold with ``F.sum``,
    sums with ``F.sum``, min/max with themselves. Example::

        salted_agg(df, ["k"], {
            "n":     (F.count("*"), F.sum),
            "total": (F.sum("v"),   F.sum),
            "hi":    (F.max("v"),   F.max),
        })
    """
    salt = (
        F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*group_keys).agg(
        *[refold(name).alias(name) for name, (_, refold) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with left-side hot-key salting.

    Left rows get a deterministic salt from their full-row hash; the
    right side is exploded ×``salt_buckets`` so each (key, salt) bucket
    pairs up. Equivalent row-multiset to ``left.join(right, key)``.
    Non-key column names must be disjoint between the two sides (same
    requirement a plain ``join(…, key)`` has for unambiguous selects).
    """
    lcols = [c for c in left.columns if c != key]
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)),
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return (
        salted_left.join(exploded_right, [key, "_salt"])
        .drop("_salt")
        .select(key, *lcols, *[c for c in right.columns if c != key])
    )


# -- driver-checkable queries: the rewrites must be RESULT-IDENTICAL to
# the plain formulations, so each has the plain SQL as its oracle ------

from pyspark.sql import SparkSession  # noqa: E402

from dst_spark_k8_lakehouse_spark.exact import cents  # noqa: E402
from dst_spark_k8_lakehouse_spark.registry import query  # noqa: E402
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table  # noqa: E402


@query(
    "k1_salted_agg",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def k1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: skew-safe two-level aggregation — 600k rows funnel into
    3 group keys (the hot-key shape AQE cannot split, because a single
    KEY, not a single partition, is oversized). The salt stage caps any
    reducer at ~1/16 of a hot key's rows; the refold stage is 48 rows.
    Oracle = the plain GROUP BY: the rewrite must be result-identical.
    """
    return salted_agg(
        load_table(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        {
            "n_items": (F.count("*"), F.sum),
            "total_qty": (
                F.sum(cents("l_quantity")),
                lambda c: (F.sum(c) / 100).cast("double"),
            ),
        },
        salt_source="l_orderkey",
    )


@query(
    "k2_salted_join",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
)
def k2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: left-salted shuffle join — lineitem keys salted by full-row
    hash, orders exploded ×8 so every (key, salt) bucket matches; the
    row multiset equals the plain join (asserted by the oracle's plain
    JOIN). The shape for a hot-key fact-fact join where the right side
    is too big to broadcast; right-side ×8 duplication buys left-side
    reducer balance."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    return (
        salted_join(li, od, "k", salt_buckets=8)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(cents("l_extendedprice")) / 100)
            .cast("double")
            .alias("revenue"),
        )
    )
