"""Aggregations (SURVEY.md §2.5).

Reference evidence: ``modules/dst_metrics/utils.py:10-22`` (count / avg /
filtered count), ``06_pipeline_metrics_demo.ipynb:224-247,360-393``
(null audit, duplicate count, group-by multi-agg, global sum),
``05_datahub_lineage_demo.ipynb:154-159`` (multi-agg with aliases).

All of these compile to Spark's partial+final hash aggregate: map-side
combine means the shuffle carries one row per (group, task), so group-bys
on low-cardinality keys cost ~nothing extra at 100 TB. Float outputs are
rounded to 2dp — summation order differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.exact import avg_sql, exact_avg, exact_sum, sum_sql
from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query("a1_count", oracle="SELECT count(*) AS n_rows FROM lineitem")
def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global row count (``utils.py:10-11`` ``df.count()``)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows")
    )


@query(
    "a2_avg",
    oracle=f"SELECT {avg_sql('c_acctbal')} AS avg_acctbal FROM customer",
)
def a2_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: global average (agg-map form ``utils.py:13-17`` is
    ``df.agg({column: "avg"})``; here decimal-exact for the oracle —
    see ``exact.py``)."""
    return load_table(spark, sf_dir, "customer").agg(
        exact_avg("c_acctbal").alias("avg_acctbal")
    )


@query(
    "a3_sum",
    oracle=f"SELECT {sum_sql('o_totalprice')} AS total_revenue FROM orders",
)
def a3_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: global sum (``06_…ipynb:393`` ``agg(spark_sum("amount"))``)."""
    return load_table(spark, sf_dir, "orders").agg(
        exact_sum("o_totalprice").alias("total_revenue")
    )


@query(
    "a4_filtered_count",
    oracle="""
        SELECT count(*) AS n_urgent FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """,
)
def a4_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: filtered count (``utils.py:19-22`` ``filter(...).count()``)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.count("*").alias("n_urgent"))
    )


@query(
    "a5_groupby_agg",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               {sum_sql('l_quantity')} AS sum_qty,
               {sum_sql('l_extendedprice')} AS sum_price,
               {avg_sql('l_discount', round_to=4)} AS avg_disc,
               CAST(CAST(max(l_shipdate) AS DATE) AS TIMESTAMP) AS last_ship
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def a5_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: multi-key group-by with count/sum/avg/max
    (``05_…ipynb:154-159``, ``06_…ipynb:360-365``) — TPC-H Q1 shape."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_price"),
            exact_avg("l_discount", round_to=4).alias("avg_disc"),
            F.max(F.col("l_shipdate").cast("date")).cast("timestamp").alias("last_ship"),
        )
    )


@query(
    "a7_null_audit",
    oracle="""
        SELECT CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS status_nulls,
               CAST(sum(CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS priority_nulls
        FROM orders
    """,
)
def a7_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-column null audit (``06_…ipynb:224-227``:
    ``sum(when(col(c).isNull(), 1).otherwise(0))`` per column).
    NULLs manufactured with ``nullif`` — testdata is null-free."""
    df = load_table(spark, sf_dir, "orders").select(
        F.expr("nullif(o_orderstatus, 'O')").alias("status"),
        F.expr("nullif(o_orderpriority, '1-URGENT')").alias("priority"),
    )
    return df.agg(
        F.sum(F.when(F.col("status").isNull(), 1).otherwise(0)).alias(
            "status_nulls"
        ),
        F.sum(F.when(F.col("priority").isNull(), 1).otherwise(0)).alias(
            "priority_nulls"
        ),
    )


@query(
    "a8_dup_count",
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT o_custkey) AS n_keys,
               count(*) - count(DISTINCT o_custkey) AS n_dups
        FROM orders
    """,
)
def a8_dup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: duplicate count = total − distinct keys (``06_…ipynb:245-247``)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_keys"),
        (F.count("*") - F.countDistinct("o_custkey")).alias("n_dups"),
    )


@query(
    "a9_min_cdist",
    oracle="""
        SELECT round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal,
               count(DISTINCT c_mktsegment) AS n_segments
        FROM customer
    """,
)
def a9_min_cdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: min / max / countDistinct."""
    return load_table(spark, sf_dir, "customer").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "a10_approx",
    oracle="""
        SELECT count(DISTINCT l_partkey) AS exact_parts,
               count(*) AS n_rows,
               TRUE AS approx_distinct_ok,
               TRUE AS median_rank_ok
        FROM lineitem
    """,
)
def a10_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: approximate distinct + approximate percentile — HLL++ and
    KLL-style sketches. At 100 TB these replace exact countDistinct
    (full shuffle of keys) with fixed-size mergeable sketch state.

    Sketch outputs are estimator-specific, so raw values can't be
    hash-compared against another engine; what CAN be checked is the
    documented error bound, and that is what this query emits — a
    bounded-error contract, not a rows-only run:

    - ``approx_distinct_ok``: |HLL estimate − exact| / exact ≤ 3·rsd
      (rsd 0.05 ⇒ 15%; the estimate is deterministic for fixed data).
    - ``median_rank_ok``: the true rank interval of the value
      ``percentile_approx`` returns (accuracy 10000 ⇒ rank error
      1/10000) intersects (0.5 ± 0.001)·n — 10× slack on the bound,
      tie-aware via the [rank_lt+1, rank_le] interval.

    The exact aggregates ride along, so the oracle cross-checks real
    values (count distinct, row count), and TRUE/TRUE pins the bounds.
    """
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("apx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx(
            "l_quantity", F.lit(0.5), F.lit(10000)
        ).alias("apx_med"),
        F.count("*").alias("n_rows"),
    )
    # 1-row stats side broadcast against the fact scan: one extra pass
    # to locate the approx median's true rank interval, no shuffle.
    ranks = (
        li.select("l_quantity")
        .crossJoin(F.broadcast(stats))
        .agg(
            F.first("apx_parts").alias("apx_parts"),
            F.first("exact_parts").alias("exact_parts"),
            F.first("n_rows").alias("n_rows"),
            F.sum(
                F.when(F.col("l_quantity") < F.col("apx_med"), 1).otherwise(0)
            ).alias("rank_lt"),
            F.sum(
                F.when(F.col("l_quantity") <= F.col("apx_med"), 1).otherwise(0)
            ).alias("rank_le"),
        )
    )
    eps = 0.001
    return ranks.select(
        "exact_parts",
        "n_rows",
        (
            F.abs(F.col("apx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.15
        ).alias("approx_distinct_ok"),
        (
            (F.col("rank_lt") + 1 <= (0.5 + eps) * F.col("n_rows"))
            & (F.col("rank_le") >= (0.5 - eps) * F.col("n_rows"))
        ).alias("median_rank_ok"),
    )


@query(
    "a10_percentile",
    oracle="""
        SELECT round(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
               round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
        FROM lineitem
    """,
)
def a10_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (exact variant): interpolated percentile — oracle-checkable
    against DuckDB ``quantile_cont`` (both linear-interpolate)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias(
            "p90_price"
        ),
    )


@query(
    "a11_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: rollup (subtotals + grand total via grouping sets)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum("l_quantity").alias("sum_qty"),
        )
    )


@query(
    "a11_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: cube (all grouping-set combinations)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum("o_totalprice").alias("sum_price"),
        )
    )


@query(
    "a12_summary",
    oracle=f"""
        SELECT c_custkey, c_name, c_mktsegment,
               n_orders, total_spent, avg_order, last_order
        FROM customer
        JOIN (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   {sum_sql('o_totalprice')} AS total_spent,
                   {avg_sql('o_totalprice')} AS avg_order,
                   CAST(CAST(max(o_orderdate) AS DATE) AS TIMESTAMP) AS last_order
            FROM orders
            WHERE o_orderstatus = 'F'
            GROUP BY o_custkey
        ) s ON c_custkey = s.o_custkey
    """,
)
def a12_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: derived-table pattern — agg then join then select
    (``05_…ipynb:147-196`` customer summary). Aggregating BEFORE the
    join shrinks the fact side to one row per customer, which is the
    scale-correct order (join after agg, not agg after join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    summary = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice").alias("total_spent"),
            exact_avg("o_totalprice").alias("avg_order"),
            F.max(F.col("o_orderdate").cast("date")).cast("timestamp").alias("last_order"),
        )
    )
    return customer.join(
        summary, customer.c_custkey == summary.o_custkey
    ).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "n_orders",
        "total_spent",
        "avg_order",
        "last_order",
    )


@query(
    "a11_gsets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_rows
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a11_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: explicit GROUPING SETS through the SQL entry point (the
    reference's primary interface is ``spark.sql`` over catalog views,
    SURVEY §3.1) — per-status totals, per-priority totals, grand total
    in one pass (Expand + single aggregate, no self-union)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_gsets"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "a13_pivot",
    oracle=f"""
        SELECT o_orderpriority,
               {", ".join(
                   f"CAST(sum(CASE WHEN o_orderstatus = '{s}' "
                   f"THEN CAST(round(o_totalprice * 100) AS BIGINT) "
                   f"ELSE 0 END) AS DOUBLE) / 100 AS {s}"
                   for s in ("F", "O", "P")
               )}
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: pivot — order totals as a priority × status matrix.

    The status values are passed EXPLICITLY to ``pivot()``: without
    them Spark runs an extra distinct-collect job over the fact table
    to discover columns, and the output schema becomes data-dependent
    (a new status silently widens the table downstream). Explicit
    values keep it one pass + one shuffle (partial agg on
    (priority, status) before the exchange) and a fixed contract.
    Cents-exact sums. Absent (priority, status) cells must be 0 like
    the oracle's CASE…ELSE 0 — and a coalesce INSIDE ``agg()`` cannot
    do that: Spark's PivotFirst rewrite fills missing cells with NULL
    *after* the aggregate runs, so the fill has to happen post-pivot
    (``na.fill`` on the pivoted columns)."""
    from dst_spark_k8_lakehouse_spark.exact import cents

    statuses = ["F", "O", "P"]
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg((F.sum(cents("o_totalprice")) / 100).cast("double"))
        .na.fill(0.0, statuses)
    )


@query(
    "a13_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, charge, amount
        FROM (SELECT l_orderkey, l_linenumber,
                     l_extendedprice AS price,
                     l_discount AS discount,
                     l_tax AS tax
              FROM lineitem)
        UNPIVOT (amount FOR charge IN (price, discount, tax))
    """,
)
def a13_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: unpivot/melt — wide charge columns to long (charge, amount)
    rows, the inverse reshape (``DataFrame.unpivot``, Spark ≥3.4).
    Map-side Expand node: 3 output rows per input row, no shuffle, no
    Python."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["price", "discount", "tax"],
        "charge",
        "amount",
    )
