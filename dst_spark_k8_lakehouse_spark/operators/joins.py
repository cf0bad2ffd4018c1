"""Joins (SURVEY.md §2.4), including the flagship star join.

Reference evidence: USING-style inner join ``modules/dst_metrics/demo.py:
104``, explicit join type ``06_pipeline_metrics_demo.ipynb:339``,
agg→join chains ``05_datahub_lineage_demo.ipynb:147-175``.

Scale posture per join:
- dimension joins (nation/region, and customer against fact output)
  are explicitly ``F.broadcast`` — no shuffle of the big side;
- fact-fact joins (lineitem⋈orders) shuffle on the join key and rely
  on AQE for skew splitting; at 100 TB you'd additionally bucket both
  tables on orderkey (see plans/lakehouse notes);
- the as-of join avoids a per-row range probe entirely: it is a
  union + window (one shuffle on user_id, linear scan per partition),
  the standard distributed as-of formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.exact import exact_sum, revenue, revenue_sql
from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "j1_inner_join",
    oracle="""
        SELECT o_custkey AS custkey, o_orderkey, o_totalprice, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: inner equi-join on a shared key name (``demo.py:104``
    ``df.join(orders_df, "customer_id")``)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    return orders.join(customer, "custkey", "inner")


@query(
    "j3_left_join",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def j3_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join — unmatched customers keep NULL order cols."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "j4_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi join (EXISTS) — customers having at least one order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j4_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
)
def j4_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti join (NOT EXISTS) — customers with no urgent order
    (the priority filter keeps the result non-empty at every sf, so the
    oracle check is not vacuous)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j5_broadcast",
    oracle="""
        SELECT c_custkey, c_name, n_name AS nation
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def j5_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explicit broadcast-hash join of a small dimension — the big
    side never shuffles; at 100 TB this is mandatory for dim joins."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
    ).select("c_custkey", "c_name", F.col("n_name").alias("nation"))


@query(
    "j6_range_join",
    oracle="""
        SELECT p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN part
          ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        GROUP BY p_brand
    """,
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: equi-join with a range residual (band join). Catalyst keeps
    the equi part as the hash/sort-merge key and applies the range as a
    post-join filter — scales like a plain equi-join, unlike a pure
    theta join (which would be a broadcast-nested-loop)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (lineitem.l_partkey == part.p_partkey) & (
        lineitem.l_quantity.between(part.p_size - 5, part.p_size + 5)
    )
    return (
        lineitem.join(part, cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
    )


@query(
    "j7_asof",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               date_trunc('second', p.ts) AS purchase_ts,
               date_trunc('second', c.ts) AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j7_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — each purchase matched to the same user's most
    recent click at or before it.

    Distributed formulation (no native as-of in Spark): tag and union
    both sides, one shuffle on (user_id), then a running
    ``last(click_ts, ignorenulls)`` window. Cost is a single sort per
    user partition — at 100 TB this beats any per-row range probe and
    never materializes the quadratic candidate space.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("is_purchase"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_purchase"),
    )
    merged = purchases.unionByName(clicks)
    # clicks sort before purchases at an identical ts (is_purchase asc),
    # matching the oracle's inclusive `p.ts >= c.ts`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn(
            "click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_trunc("second", "ts").alias("purchase_ts"),
            F.date_trunc("second", "click_ts").alias("click_ts"),
        )
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Flagship: revenue by nation over the full star schema.

    The reference's canonical pipeline shape — filter → agg → join →
    select → orderBy ("customer summary", ``05_…ipynb:147-175``) —
    transposed to TPC-H tables. Plan shape at scale: lineitem⋈orders
    shuffles on orderkey (AQE-skew-safe); customer is reduced to two
    columns before its join; nation/region are broadcast. Aggregation
    is partial (map-side) then final, so the shuffled payload is one
    row per (nation) per task, not per lineitem.
    """
    joined = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # The aggregate's cardinality is bounded by |nation|×|region|
    # (~125 rows at ANY scale factor), so the global sort runs as a
    # single-partition sortWithinPartitions: coalesce(1) narrows the
    # final-agg stage to one task reading all partial outputs — no
    # third exchange, and no rangepartitioning SAMPLING job (orderBy
    # on a distributed frame schedules one just to pick range bounds).
    return (
        joined.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            revenue("l_extendedprice", "l_discount").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .coalesce(1)
        .sortWithinPartitions(F.desc("revenue"))
    )


@query(
    "j8_star_join",
    oracle=f"""
        SELECT r_name AS region,
               n_name AS nation,
               {revenue_sql('l_extendedprice', 'l_discount')} AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
)
def j8_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: multi-way star join (flagship; also the ``entry`` smoke query)."""
    return revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "x1_q3_shipping",
    oracle=f"""
        SELECT l_orderkey,
               {revenue_sql('l_extendedprice', 'l_discount')} AS revenue,
               CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
    """,
)
def x1_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite workload (TPC-H Q3 shape): selective dimension filter →
    two fact joins → group → top-k by revenue. The composition proof
    that the operator inventory works *together*: predicate pushdown on
    three scans, stats-driven auto-broadcast of the filtered customer
    side (no forced hint — it degrades to a shuffle join safely at
    SF=1000), partial agg, TakeOrderedAndProject for the top-20.
    Deterministic tiebreak on l_orderkey keeps the cut hash-stable.

    Eager-aggregation shape (r13, guide §2.3 "aggregate before you
    shuffle"): lineitem is pre-aggregated by ``l_orderkey`` BEFORE the
    join, so the one fact-sized exchange carries map-side partial-agg
    output (~1 narrow row per order per input partition) instead of
    every surviving lineitem row — and the post-join groupBy exchange
    disappears entirely. Equivalence: ``o_orderkey`` is the orders
    primary key, so ``order_date``/``o_orderpriority`` are functions of
    the join key and the original GROUP BY (l_orderkey, date, priority)
    collapses to GROUP BY l_orderkey followed by a 1:1 join — proven
    value-identical to the join-then-agg shape and to the oracle at
    sf0.01/sf0.1. No broadcast HINT anywhere: a hint FORCES broadcast
    at any size (OOM at SF=1000); the planner broadcasts the
    pre-aggregated side locally from stats and degrades to a shuffle
    join when it outgrows the threshold."""
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1998-01-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    lineitem = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1996-01-01")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    li_agg = lineitem.groupBy("l_orderkey").agg(
        revenue("l_extendedprice", "l_discount").alias("revenue")
    )
    return (
        li_agg.join(
            orders.join(customer, orders.o_custkey == customer.c_custkey),
            li_agg.l_orderkey == orders.o_orderkey,
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


@query(
    "x2_q10_returns",
    oracle=f"""
        SELECT c_custkey, c_name, n_name AS nation,
               {revenue_sql('l_extendedprice', 'l_discount')} AS revenue,
               count(*) AS n_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def x2_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite workload #2 (TPC-H Q10 shape): which customers
    returned the most revenue in a half-year — date-windowed fact
    filter → fact-fact join → two dimension joins → group → top-20.

    Plan: both fact filters push to the scans; the date-filtered
    orders slice (≈8% of orders) auto-broadcasts into lineitem from
    stats so the big fact never shuffles pre-aggregation locally;
    nation broadcasts by hint (guaranteed small at any SF); customer
    auto-broadcasts. No hints on data-dependent sides — a hint FORCES
    broadcast at any size, while the stats/AQE decision degrades the
    orders and customer joins to shuffles at SF=1000, the plan Q10
    wants at that scale. Partial agg before the single groupBy
    shuffle; ``TakeOrderedAndProject`` for the top-20 with a
    c_custkey tiebreak."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    lineitem = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("c_custkey", "c_name", "nation")
        .agg(
            revenue("l_extendedprice", "l_discount").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
