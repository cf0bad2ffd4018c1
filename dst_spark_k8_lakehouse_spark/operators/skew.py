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
