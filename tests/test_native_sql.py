"""execute_native_sql: the reference notebooks' statement TEXT
(UPDATE / DELETE / MERGE / VACUUM / OPTIMIZE [ZORDER BY] / RESTORE /
ALTER TABLE ...) dispatched onto native Delta and Iceberg tables by
format detection — skeleton-parsed, expressions verbatim, loud on
anything unrecognized."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dst_spark_k8_lakehouse_spark.plans import delta_reader as dr
from dst_spark_k8_lakehouse_spark.plans import delta_writer as dw
from dst_spark_k8_lakehouse_spark.plans import iceberg_reader as ir
from dst_spark_k8_lakehouse_spark.plans import iceberg_writer as iw
from dst_spark_k8_lakehouse_spark.plans.dml import execute_native_sql


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x")
    )


def test_update_delete_both_formats(spark, tmp_path):
    td = str(tmp_path / "d")
    ti = str(tmp_path / "i")
    dw.create_delta(_df(spark, 0, 10), td)
    iw.create_iceberg(_df(spark, 0, 10), ti)
    tabs = {"t": td, "u": ti}
    execute_native_sql(spark, "UPDATE t SET x = 0.0 WHERE id < 2", tabs)
    execute_native_sql(spark, "DELETE FROM t WHERE id >= 8;", tabs)
    execute_native_sql(spark, "UPDATE u SET x = -1.0 WHERE id = 5", tabs)
    execute_native_sql(spark, "DELETE FROM u WHERE id > 7", tabs)
    got_d = {(r.id, r.x) for r in dr.read_delta(spark, td).collect()}
    assert got_d == {(i, 0.0 if i < 2 else i * 2.0) for i in range(8)}
    got_i = {(r.id, r.x) for r in ir.read_iceberg(spark, ti).collect()}
    assert got_i == {
        (i, -1.0 if i == 5 else i * 2.0) for i in range(8)
    }


def test_merge_text_with_dataframe_source(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 5), td)
    src = spark.createDataFrame([(2, 50.0), (9, 90.0)],
                                "id long, x double")
    execute_native_sql(
        spark,
        "MERGE INTO t AS a USING s AS b ON a.id = b.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": td},
        sources={"s": src},
    )
    got = {(r.id, r.x) for r in dr.read_delta(spark, td).collect()}
    assert got == {(0, 0.0), (1, 2.0), (2, 50.0), (3, 6.0),
                   (4, 8.0), (9, 90.0)}


def test_maintenance_statements(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 100).repartition(6), td)   # v0
    tabs = {"t": td}
    # OPTIMIZE ZORDER rewrites (dataChange=false)
    v = execute_native_sql(spark, "OPTIMIZE t ZORDER BY (x, id)", tabs)
    assert v == 1
    assert {r.id for r in dr.read_delta(spark, td).collect()} \
        == set(range(100))
    # RESTORE back to the pre-zorder layout
    execute_native_sql(spark, "RESTORE TABLE t TO VERSION AS OF 0", tabs)
    # VACUUM drops the zordered files (only v2's state retained)
    execute_native_sql(spark, "VACUUM t RETAIN 1 VERSIONS", tabs)
    assert {r.id for r in dr.read_delta(spark, td).collect()} \
        == set(range(100))


def test_alter_and_tblproperties(spark, tmp_path):
    td = str(tmp_path / "d")
    ti = str(tmp_path / "i")
    dw.create_delta(_df(spark, 0, 3), td)
    iw.create_iceberg(_df(spark, 0, 3), ti)
    tabs = {"t": td, "u": ti}
    execute_native_sql(spark, "ALTER TABLE t ADD COLUMN note string", tabs)
    assert "note" in dr.read_delta(spark, td).columns
    execute_native_sql(spark, "ALTER TABLE u RENAME COLUMN x TO y", tabs)
    assert "y" in ir.read_iceberg(spark, ti).columns
    execute_native_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed' = 'true')",
        tabs,
    )
    from dst_spark_k8_lakehouse_spark.plans import delta_cdf

    state = dr._replay(spark, td, None)
    assert delta_cdf.cdf_enabled(state["metaData"])


def test_unrecognized_raises(spark, tmp_path):
    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 3), td)
    with pytest.raises(ValueError, match="not a supported"):
        execute_native_sql(spark, "TRUNCATE TABLE t", {"t": td})
    with pytest.raises(ValueError, match="unknown table"):
        execute_native_sql(spark, "DELETE FROM nope", {"t": td})
    with pytest.raises(NotImplementedError, match="RESTORE"):
        ti = str(tmp_path / "i")
        iw.create_iceberg(_df(spark, 0, 3), ti)
        execute_native_sql(
            spark, "RESTORE TABLE u TO VERSION AS OF 0", {"u": ti}
        )


class TestNotebookReplay:
    """The reference notebooks' CREATE / INSERT / SELECT statement text
    replayed VERBATIM against native logs (VERDICT r6 item 7):
    ``getting_started.py:130-168`` and the partitioned-table DDL from
    ``02_iceberg_demo.ipynb``."""

    def test_getting_started_flow_replays(self, spark, tmp_path):
        from dst_spark_k8_lakehouse_spark.plans.dml import (
            query_native_sql,
        )

        tables = {
            "polaris.demo.users": str(tmp_path / "users_iceberg"),
            "delta.`s3a://polaris/delta/demo/users_delta`": str(
                tmp_path / "users_delta"
            ),
        }
        stmts = [
            # getting_started.py:125
            "CREATE DATABASE IF NOT EXISTS polaris.demo",
            # :129
            "DROP TABLE IF EXISTS polaris.demo.users",
            # :130-138
            """
            CREATE TABLE polaris.demo.users (
                id INT,
                name STRING,
                age INT
            )
            USING iceberg
            """,
            # :143-149
            """
            CREATE TABLE IF NOT EXISTS
            delta.`s3a://polaris/delta/demo/users_delta` (
                id INT,
                name STRING,
                age INT
            ) USING delta
            """,
            # :153
            "INSERT INTO polaris.demo.users VALUES"
            " (1, 'Alice', 30), (2, 'Bob', 25)",
            # :157-159
            "INSERT INTO delta.`s3a://polaris/delta/demo/users_delta`"
            " VALUES (3, 'Carol', 40), (4, 'Dave', 35)",
        ]
        for s in stmts:
            execute_native_sql(spark, s, tables)
        # :163-168 — read both back through statement text
        got_i = query_native_sql(
            spark, "SELECT * FROM polaris.demo.users", tables
        )
        assert {(r.id, r.name, r.age) for r in got_i.collect()} == {
            (1, "Alice", 30), (2, "Bob", 25)
        }
        got_d = query_native_sql(
            spark,
            "SELECT * FROM delta.`s3a://polaris/delta/demo/users_delta`",
            tables,
        )
        assert {(r.id, r.name, r.age) for r in got_d.collect()} == {
            (3, "Carol", 40), (4, "Dave", 35)
        }
        # the directories really are native-format tables
        assert ir.is_iceberg_table(tables["polaris.demo.users"])
        assert dr.is_delta_table(
            tables["delta.`s3a://polaris/delta/demo/users_delta`"]
        )

    def test_iceberg_demo_partitioned_ddl_replays(self, spark, tmp_path):
        """02_iceberg_demo's days(ts) CREATE + INSERT + UPDATE/DELETE —
        the hidden-partition DDL lands as a native transform spec."""
        from dst_spark_k8_lakehouse_spark.plans.dml import (
            query_native_sql,
        )

        tables = {"polaris.sales_db.orders": str(tmp_path / "orders")}
        execute_native_sql(
            spark,
            """
            CREATE TABLE polaris.sales_db.orders (
                order_id BIGINT,
                customer_id BIGINT,
                amount DOUBLE,
                ts TIMESTAMP
            )
            USING iceberg
            PARTITIONED BY (days(ts))
            """,
            tables,
        )
        meta, _ = iw._load_meta(tables["polaris.sales_db.orders"])
        assert iw._spec_fields(meta)[0]["transform"] == "day"
        execute_native_sql(
            spark,
            """
            INSERT INTO polaris.sales_db.orders VALUES
            (1, 100, 50.0, TIMESTAMP '2023-01-01 10:00:00'),
            (2, 101, 25.5, TIMESTAMP '2023-01-01 11:00:00'),
            (3, 100, 100.0, TIMESTAMP '2023-01-02 09:00:00')
            """,
            tables,
        )
        # the demo's UPDATE and DELETE statements (:91, :103)
        execute_native_sql(
            spark,
            "UPDATE polaris.sales_db.orders SET amount = 60.0"
            " WHERE order_id = 1",
            tables,
        )
        execute_native_sql(
            spark,
            "DELETE FROM polaris.sales_db.orders WHERE order_id = 2",
            tables,
        )
        got = query_native_sql(
            spark, "SELECT * FROM polaris.sales_db.orders", tables
        )
        assert {(r.order_id, r.amount) for r in got.collect()} == {
            (1, 60.0), (3, 100.0)
        }
        # the day partition records survived the DML round trip
        by_day = {}
        snaps = {int(s["snapshot-id"]): s for s in meta["snapshots"]}
        meta2, _ = iw._load_meta(tables["polaris.sales_db.orders"])
        snaps = {
            int(s["snapshot-id"]): s for s in meta2["snapshots"]
        }
        data, _p, _e = ir._snapshot_entries(
            spark, snaps[int(meta2["current-snapshot-id"])],
            iw._spec_fields(meta2),
        )
        days = {e["pv"]["ts_day"] for e in data}
        assert days == {19358, 19359}  # 2023-01-01, 2023-01-02

    def test_create_errors_are_loud(self, spark, tmp_path):
        tables = {"t": str(tmp_path / "t"), "d": str(tmp_path / "d")}
        execute_native_sql(
            spark, "CREATE TABLE t (id INT) USING iceberg", tables
        )
        with pytest.raises(ValueError, match="already exists"):
            execute_native_sql(
                spark, "CREATE TABLE t (id INT) USING iceberg", tables
            )
        # IF NOT EXISTS: quiet no-op
        execute_native_sql(
            spark, "CREATE TABLE IF NOT EXISTS t (id INT) USING iceberg",
            tables,
        )
        with pytest.raises(NotImplementedError, match="transform"):
            execute_native_sql(
                spark,
                "CREATE TABLE d (id INT, ts TIMESTAMP) USING delta "
                "PARTITIONED BY (days(ts))",
                tables,
            )
        with pytest.raises(ValueError, match="no table"):
            execute_native_sql(spark, "DROP TABLE d", tables)
        with pytest.raises(ValueError, match="arity"):
            execute_native_sql(
                spark, "INSERT INTO t VALUES (1, 2)", tables
            )


def test_partition_field_statements(spark, tmp_path):
    """ALTER TABLE ... ADD/DROP PARTITION FIELD as statement text —
    the spec-evolution SQL surface routed onto the native writer."""
    tables = {"t": str(tmp_path / "t"), "d": str(tmp_path / "d")}
    execute_native_sql(
        spark,
        "CREATE TABLE t (id BIGINT, ts TIMESTAMP) USING iceberg",
        tables,
    )
    execute_native_sql(
        spark, "ALTER TABLE t ADD PARTITION FIELD days(ts)", tables
    )
    meta, _ = iw._load_meta(tables["t"])
    assert iw._spec_fields(meta)[0]["transform"] == "day"
    execute_native_sql(
        spark,
        "INSERT INTO t VALUES (1, TIMESTAMP '2024-01-01 10:00:00')",
        tables,
    )
    assert ir.read_iceberg(spark, tables["t"]).count() == 1
    execute_native_sql(
        spark, "ALTER TABLE t DROP PARTITION FIELD ts_day", tables
    )
    meta, _ = iw._load_meta(tables["t"])
    assert iw._spec_fields(meta)[0]["transform"] == "void"
    # Delta refuses loudly
    execute_native_sql(
        spark, "CREATE TABLE d (id BIGINT) USING delta", tables
    )
    with pytest.raises(NotImplementedError, match="Iceberg"):
        execute_native_sql(
            spark, "ALTER TABLE d ADD PARTITION FIELD bucket(4, id)",
            tables,
        )


def test_statement_text_iceberg_sort_order_and_optimize(spark, tmp_path):
    """r8: ``ALTER TABLE t WRITE ORDERED BY (id)`` records the sort
    order, and ``OPTIMIZE t`` / ``OPTIMIZE t ZORDER BY (...)`` on an
    Iceberg directory run the sort-aware rewrite — range reads touch
    fewer files afterwards."""
    from pyspark.sql import functions as F

    from dst_spark_k8_lakehouse_spark.plans import (
        iceberg_reader,
        iceberg_writer,
    )
    from dst_spark_k8_lakehouse_spark.plans.dml import execute_native_sql

    t = str(tmp_path / "ice")
    df = spark.range(2000).select(
        ((F.col("id") * 2654435761) % 2000).alias("id"),
        (F.col("id") % 7).alias("x"),
    ).repartition(8)
    iceberg_writer.create_iceberg(df, t)
    tables = {"tbl": t}
    execute_native_sql(spark, "ALTER TABLE tbl WRITE ORDERED BY (id)",
                       tables)
    meta, _ = iceberg_writer._load_meta(t)
    assert iceberg_writer.default_sort_columns(meta) == ["id"]
    snap = execute_native_sql(spark, "OPTIMIZE tbl", tables)
    assert snap > 0
    got = iceberg_reader.read_iceberg(spark, t,
                                      predicates=[("id", "<", 100)])
    assert got.count() == 100
    assert len(set(got.inputFiles())) <= 2
    # zorder spelling routes too
    snap2 = execute_native_sql(spark, "OPTIMIZE tbl ZORDER BY (id, x)",
                               tables)
    assert snap2 > snap
    assert iceberg_reader.read_iceberg(spark, t).count() == 2000


def test_select_join_plans_through_cbo(spark, tmp_path):
    """VERDICT r12 item 6: statement-text joins over native tables
    must plan through the CBO (plan_star_join) — with Spark's own
    size-based broadcasting OFF, the executed plan still shows
    BroadcastHashJoins (the advisor's hints), a 3-table FROM joins
    the selective dim first, and the values are right."""
    from dst_spark_k8_lakehouse_spark.plans.dml import query_native_sql

    fact = str(tmp_path / "fact")
    whole = str(tmp_path / "whole")
    sel = str(tmp_path / "sel")
    dw.create_delta(
        spark.range(4000).select(
            (F.col("id") % 100).alias("wk"),
            (F.col("id") % 100).alias("sk"),
            (F.col("id") * 3).alias("v"),
        ).repartition(4),
        fact,
    )
    iw.create_iceberg(
        spark.range(100).select(
            F.col("id").alias("wk"),
            F.concat(F.lit("w-"), F.col("id")).alias("wname"),
        ).coalesce(1),
        whole,
    )
    iw.create_iceberg(
        spark.range(20).select(
            F.col("id").alias("sk"),
            F.concat(F.lit("s-"), F.col("id")).alias("sname"),
        ).coalesce(1),
        sel,
    )
    for t in (whole, sel):
        iw.write_table_statistics(spark, t, k=1024)
    tabs = {"fact": fact, "dim_whole": whole, "dim_sel": sel}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = query_native_sql(
            spark,
            "SELECT * FROM fact JOIN dim_whole USING (wk) "
            "JOIN dim_sel USING (sk) WHERE v % 2 = 0",
            tabs,
        )
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert executed.count("BroadcastHashJoin") == 2
        got = df.toPandas()
        # sel covers sk 0-19 → 4000/5 rows survive, then the residual
        assert len(got) == sum(
            1 for i in range(4000) if i % 100 < 20 and (i * 3) % 2 == 0
        )
        assert (got["wname"] == "w-" + got["wk"].astype(str)).all()
        assert (got["sname"] == "s-" + got["sk"].astype(str)).all()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_select_join_empty_using_raises(spark, tmp_path):
    from dst_spark_k8_lakehouse_spark.plans.dml import query_native_sql

    td = str(tmp_path / "d")
    dw.create_delta(_df(spark, 0, 5), td)
    with pytest.raises(ValueError, match="USING"):
        query_native_sql(
            spark, "SELECT * FROM t JOIN t USING ()", {"t": td}
        )
