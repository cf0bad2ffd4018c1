"""Medallion pipeline helpers — the bronze→silver→gold data-quality flow
of ``06_pipeline_metrics_demo.ipynb`` (cells: null audit :224-227, dup
count :245-247, silver cleaning :264-265, gold agg :339-365) as reusable
DataFrame transforms. Layer numbering follows the reference (1=bronze,
2=silver, 3=gold, ``06_…ipynb:144``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BRONZE, SILVER, GOLD = 1, 2, 3


def null_audit(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Per-column null counts in one pass
    (``sum(when(isNull,1).otherwise(0))`` per column, 06_…ipynb:224-227)."""
    cols = columns or df.columns
    row = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in cols
        ]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in cols}


def duplicate_count(df: DataFrame, keys: list[str]) -> int:
    """Rows beyond the first per key (count − distinct-key count,
    06_…ipynb:245-247)."""
    return df.count() - df.dropDuplicates(keys).count()


def clean_silver(
    df: DataFrame, keys: list[str], defaults: dict[str, object]
) -> DataFrame:
    """Silver-layer cleaning: dedup on key + per-column null defaults
    (``dropDuplicates([...]) + fillna({...})``, 06_…ipynb:264-265)."""
    return df.dropDuplicates(keys).fillna(defaults)


def gold_customer_summary(
    customers: DataFrame, orders: DataFrame
) -> DataFrame:
    """Gold-layer aggregate: join + multi-key groupBy + count/sum/avg
    (06_…ipynb:339-365)."""
    return (
        customers.join(orders, "customer_id", "inner")
        .groupBy("customer_id", "name", "city")
        .agg(
            F.count("order_id").alias("n_orders"),
            F.sum("amount").alias("total_amount"),
            F.avg("amount").alias("avg_amount"),
        )
    )
