"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (on in ``session.py``) handles most hot keys
at runtime by splitting oversized shuffle partitions. These rewrites
cover what it does not — with their limits stated honestly:

- **salted aggregation** (two-level: salt → partial → unsalt → final).
  For plainly decomposable aggregates (sum/count/min/max) Spark's
  map-side partial aggregation ALREADY absorbs key skew — a hot key
  reaches its reducer as ~one partial row per map task, so salting
  buys nothing there and costs a second shuffle. The rewrite earns its
  keep when the per-key aggregation STATE is heavy — high-cardinality
  ``collect_set``/exact-distinct style state that partial aggregation
  must materialize per task per key — where the salt bounds any single
  task's state to ~1/salt of the hot key. ``k1_salted_agg`` registers
  the pattern with decomposable aggregates purely so the driver can
  verify the refold is result-identical to the plain groupBy.
- **salted join**: a shuffle join where the *left* side has hot keys
  and the right side is too big to broadcast. Salt the left key with
  ``pmod(xxhash64(full row), n)``, explode the right side ×n so every
  salt bucket finds its match — right-side duplication buys left-side
  balance (n stays small, 8-16). Caveat: the salt is a function of the
  whole row, so IDENTICAL duplicate rows of a hot key land in one
  bucket and get no relief — if the left side is pre-projected down to
  the key (or heavily duplicated), keep a distinguishing column in the
  frame or the salt degenerates.

Results are salt-independent by construction (the refold/union is
exact), so both rewrites reproduce the plain answers on any cluster;
``salt_source`` additionally makes the intermediate partitioning
content-deterministic rather than partition-id-dependent.
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
    """K1: the two-level salted-aggregation pattern, driver-verified
    result-identical to the plain GROUP BY (the oracle). NOTE on when
    this rewrite actually pays (module docstring): for these
    decomposable aggregates partial aggregation already absorbs the
    600k-rows-into-3-keys skew map-side — the registered query exists
    to prove refold CORRECTNESS; reach for the pattern in production
    only when per-key aggregation state is heavy (collect_set /
    exact-distinct shapes)."""
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
