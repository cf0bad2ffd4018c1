"""Scalar function sweep (SURVEY.md §2.9).

The reference directly uses only col/lit/when/isNull/cast/concat/alias
(§2.3) but ships the full Spark SQL function library in its image
(``docker/spark-base/Dockerfile:101-111``); these queries declare the
library surface group by group, each checked against DuckDB.

Everything here is a JVM-side built-in inside whole-stage codegen — the
per-row cost is nanoseconds and fully pipelined with the parquet scan;
none of it changes shape at 100 TB.

Cross-engine notes baked into the queries:
- libm-backed fns (ln, pow) are correctly-rounded in neither engine →
  floor-truncate at 1e-6 (sqrt IS exact-rounded everywhere, left raw);
- round-to-integer of positive 2-decimal values is tie-safe (HALF_UP
  and half-away-from-zero agree for positives);
- array/map outputs are reduced to scalars — engines stringify
  containers differently, so container-typed result columns are not
  hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.registry import query
from dst_spark_k8_lakehouse_spark.sources.catalog import load_table


@query(
    "f1_string",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_type) AS type_lower,
               substring(p_name, 1, 5) AS name_head,
               trim(concat('  ', p_name, '  ')) AS name_trimmed,
               CAST(length(p_name) AS INT) AS name_len,
               concat_ws('/', p_brand, p_type) AS brand_type,
               (p_name LIKE '%widget%') AS is_widget,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
               string_split(p_name, ' ')[1] AS first_word
        FROM part
    """,
)
def f1_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: upper/lower/substring/trim/length/concat_ws/like/
    regexp_extract/split (split reduced to an element — container
    outputs aren't hash-comparable)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@query(
    "f2_date",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP)
                   AS due_date,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                             DATE '2000-01-01') AS INT) AS days_to_y2k,
               date_trunc('month', o_orderdate) AS order_month_start,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders
    """,
)
def f2_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: to_date/year/month/dayofmonth/date_add/datediff/date_trunc/
    unix_timestamp over the ms-timestamp o_orderdate."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        d.cast("timestamp").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@query(
    "f3_math",
    oracle="""
        SELECT o_orderkey,
               CAST(round(o_totalprice) AS DOUBLE) AS price_rounded,
               abs(o_totalprice - 200000) AS dist_from_200k,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               sqrt(o_totalprice) AS price_sqrt,
               floor(ln(o_totalprice) * 1000000) / 1000000 AS price_ln,
               floor(pow(o_totalprice / 100000, 2) * 1000000) / 1000000
                   AS price_sq
        FROM orders
    """,
)
def f3_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: round/abs/floor/ceil/sqrt/pow/log. sqrt is IEEE
    exact-rounded (bit-identical everywhere); ln/pow are libm-backed →
    truncated at 1e-6 for cross-engine stability."""
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.round(p).cast("double").alias("price_rounded"),
        F.abs(p - 200000).alias("dist_from_200k"),
        F.floor(p).alias("price_floor"),
        F.ceil(p).alias("price_ceil"),
        F.sqrt(p).alias("price_sqrt"),
        (F.floor(F.log(p) * 1000000) / 1000000).alias("price_ln"),
        (F.floor(F.pow(p / 100000, 2) * 1000000) / 1000000).alias(
            "price_sq"
        ),
    )


@query(
    "f4_map",
    oracle="""
        SELECT event_id,
               event_type AS type_from_map,
               2 AS n_keys
        FROM events
    """,
)
def f4_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: create_map/element_at/size — the METRICS ``extra`` column
    pattern (``spark_logger.py:27`` MAP<STRING,STRING>). Map outputs
    are reduced to scalars for the oracle; construction+extraction
    round-trips the value."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("src"), F.lit("events")
    )
    return events.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(m).alias("n_keys"),
    )


@query(
    "f5_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR)
                   AS missing_key,
               concat('{"k":', json_extract_string(props, '$.k'), '}')
                   AS reserialized
        FROM events
    """,
)
def f5_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON extraction / to_json over the events.props string
    column.

    ONE ``json_tuple`` generator pass per row serves both extracted
    fields (r12, interleaved A/B at sf0.1: 0.15 → 0.10 s vs the
    ``from_json`` struct parse, identical results — json_tuple
    string-extracts without building a struct row, and the number
    token stringification matches DuckDB ``json_extract_string``
    exactly like from_json's did); the int view is a cast of the
    extracted string, to_json round-trips it."""
    events = load_table(spark, sf_dir, "events")
    jt = events.select(
        "event_id",
        F.json_tuple(F.col("props"), "k", "missing").alias(
            "k_str", "missing_key"
        ),
    )
    k_int = F.col("k_str").cast("int")
    return jt.select(
        "event_id",
        "k_str",
        k_int.alias("k_int"),
        "missing_key",
        F.to_json(F.struct(k_int.alias("k"))).alias("reserialized"),
    )


@query(
    "f6_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS n_dims,
               CAST(embedding[1] AS DOUBLE) AS first_dim,
               CAST(embedding[64] AS DOUBLE) AS last_dim,
               list_contains([label, 0], 0) AS has_zero,
               CAST(floor(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                          * 10000) / 10000 AS DOUBLE) AS dim_sum
        FROM embeddings
    """,
)
def f6_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: array size/element-access/contains + higher-order aggregate
    (sequential fold — same order both engines, truncated at 1e-4).
    float32→double element casts are bit-exact, so raw element values
    compare cleanly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.col("embedding").getItem(0).cast("double").alias("first_dim"),
        F.col("embedding").getItem(63).cast("double").alias("last_dim"),
        F.array_contains(F.array(F.col("label"), F.lit(0)), 0).alias(
            "has_zero"
        ),
        (
            F.floor(
                F.aggregate(
                    F.col("embedding").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * 10000
            )
            / 10000
        ).cast("double").alias("dim_sum"),
    )


@query(
    "f7_variant",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(props::JSON->>'k' AS INT)) AS BIGINT)
                   AS sum_k,
               CAST(count(json_extract(props::JSON, '$.missing'))
                    AS BIGINT) AS n_missing,
               'OBJECT<k: BIGINT>' AS variant_schema
        FROM events
        GROUP BY event_type
    """,
)
def f7_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (r10): the VARIANT semi-structured type — Spark 4's open
    binary JSON encoding (``parse_json`` → ``variant_get`` typed-path
    extraction, ``try_variant_get`` for absent paths,
    ``schema_of_variant``), the engine-native way to query JSON
    columns without a declared schema. At 100 TB this is the
    difference between shredding JSON once into a binary columnar
    encoding and re-parsing strings per query; the oracle runs the
    same extraction relationally through DuckDB's JSON operators, and
    Spark's INFERRED per-row variant schema is itself pinned in the
    hash (every row of ``props`` carries exactly one BIGINT ``k``)."""
    ev = load_table(spark, sf_dir, "events")
    # extract BEFORE the groupBy: a VariantType column inside the
    # aggregate buffer forces SortAggregate (variant isn't hashable);
    # projecting to primitives first keeps the agg a partial-then-
    # final HashAggregate (plan-locked in test_plan_shapes)
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.try_variant_get("v", "$.missing", "string").alias("missing"),
        F.expr("schema_of_variant(v)").alias("sch"),
    )
    # the schema pin joins in as a broadcast 1-row distinct instead of
    # max(string) inside the agg — max over a string buffer ALSO
    # forces SortAggregate; a distinct is a pure-key HashAggregate
    agg = v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.count("missing").alias("n_missing"),
    )
    sch = v.select(F.col("sch").alias("variant_schema")).distinct()
    return agg.crossJoin(F.broadcast(sch))
