"""Local replica of the driver's oracle comparison: row-count + schema
(column names) + order-insensitive value equality between a Spark result
and a DuckDB result. Stricter than a hash — on mismatch it shows the
offending frames."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for col in df.columns:
        series = df[col]
        if pd.api.types.is_datetime64_any_dtype(series):
            df[col] = series.astype("datetime64[us]")
            continue
        if series.dtype == object:
            sample = series.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (dt.date, dt.datetime)
            ):
                df[col] = pd.to_datetime(series).astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(
            by=list(df.columns), na_position="last", kind="mergesort"
        )
    return df.reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    """Assert the Spark result matches the DuckDB oracle result the way
    the driver does: same row count, same (sorted) column names, same
    values regardless of row order."""
    got = _normalize(spark_df.toPandas())
    expected = _normalize(duck_con.sql(oracle_sql).df())

    assert list(got.columns) == list(expected.columns), (
        f"schema mismatch: spark={list(got.columns)} "
        f"oracle={list(expected.columns)}"
    )
    assert len(got) == len(expected), (
        f"row-count mismatch: spark={len(got)} oracle={len(expected)}"
    )
    pd.testing.assert_frame_equal(
        got, expected, check_dtype=False, check_exact=True, obj="oracle-compare"
    )
