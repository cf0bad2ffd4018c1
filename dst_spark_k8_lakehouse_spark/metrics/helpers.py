"""Metric-source helpers — reference ``modules/dst_metrics/utils.py:
1-26`` surface (count files / df rowcount / column average / error
count), DataFrame-native."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_files(path: str) -> int:
    """Non-hidden entries in a directory (utils.py:3-8)."""
    if not os.path.exists(path):
        return 0
    return len([f for f in os.listdir(path) if not f.startswith(".")])


def df_count(df: DataFrame) -> int:
    """Row count (utils.py:10-11)."""
    return df.count()


def df_avg(df: DataFrame, column: str) -> float:
    """Column mean, 0.0 on empty/all-null (utils.py:13-17)."""
    row = df.agg({column: "avg"}).collect()
    value = row[0][0] if row else None
    return float(value) if value is not None else 0.0


def df_error_count(df: DataFrame, error_column: str = "is_error") -> int:
    """Count of flagged error rows; 0 when the flag column is absent
    (utils.py:19-22)."""
    if error_column not in df.columns:
        return 0
    return df.filter(F.col(error_column) == True).count()  # noqa: E712
