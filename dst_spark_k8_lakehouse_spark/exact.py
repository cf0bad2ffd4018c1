"""Cross-engine-exact float aggregation helpers.

Summing doubles is order-dependent at 1 ulp, and different engines (or
different partitionings of the same engine!) reduce in different orders —
so ``round(sum(double), 2)`` can flip on a rounding boundary between our
Spark plan and the DuckDB oracle, or between two runs at different
parallelism. The testdata's numeric columns are all exact 2-decimal
values, so casting to DECIMAL before aggregating makes the sum exact
(decimal arithmetic is exact in both engines), after which one double
division / final cast is bit-identical everywhere.

This is also the right call at 100 TB: money columns aggregated as
decimal are reproducible regardless of cluster size or AQE re-planning;
double sums are not.

Each Python helper has a ``*_SQL`` template producing the equivalent
DuckDB oracle expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, scale: int = 2) -> Column:
    """Lossless decimal view of a 2-decimal-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """sum(decimal) — exact, order-independent; emitted as double."""
    return F.sum(dec(col, scale)).cast("double")


def exact_avg(col: str | Column, scale: int = 2, round_to: int = 2) -> Column:
    """Truncated mean at ``round_to`` decimals, bit-identical everywhere.

    ``round()`` after a double division is NOT cross-engine stable: a
    quotient landing exactly on a half-cent tie rounds differently in
    Spark (HALF_UP on the exact expansion) vs DuckDB (scaled float
    round). ``floor`` has no tie behavior, and both engines perform the
    same IEEE double division on the same exact inputs, so
    ``floor(exact_scaled_sum / count) / 10^round_to`` is deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = 10**round_to
    scaled_sum = F.sum(dec(c, scale) * m).cast("double")
    return (F.floor(scaled_sum / F.count(c)) / m).cast("double")


def sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def avg_sql(expr: str, scale: int = 2, round_to: int = 2) -> str:
    m = 10**round_to
    return (
        f"CAST(floor(CAST(sum(CAST({expr} AS DECIMAL(18,{scale})) * {m}) AS DOUBLE)"
        f" / count({expr})) / {m} AS DOUBLE)"
    )
