"""Cross-engine-exact float aggregation helpers.

Summing doubles is order-dependent at 1 ulp, and different engines (or
different partitionings of the same engine!) reduce in different orders —
so ``round(sum(double), 2)`` can flip on a rounding boundary between our
Spark plan and the DuckDB oracle, or between two runs at different
parallelism. The testdata's numeric columns are all exact 2-decimal
values, so we aggregate them as **integer cents**: ``round(x*100)`` is
exactly the intended integer (the *100 stays within 1 ulp of it), LONG
sums are exact and order-independent, and the final double division is
one IEEE op both engines perform identically.

Why cents instead of DECIMAL(18,2): decimal aggregation semantics are
identical, but Spark's decimal sum runs outside the fast codegen path
(~5× slower on a 600k-row groupBy in measurement); LONG sums stay in
whole-stage codegen. Same exactness, full speed. This is also the right
call at 100 TB — with one caveat worth stating: a LONG cents sum
overflows at ~9.2e16 dollars, unreachable for any real money column,
but a *product* aggregate (see ``revenue_*``) adds 2 more digits; at
~1e9 rows per group × max values you'd revisit with DECIMAL or a
two-level sum. Reproducibility still beats double sums regardless of
cluster size or AQE re-planning.

Each Python helper has a ``*_SQL`` template producing the equivalent
DuckDB oracle expression. (DuckDB sums BIGINT into HUGEINT — the final
``CAST(... AS DOUBLE)`` converges both engines.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact integer view of a ``scale``-decimal-valued double column.

    round-to-nearest is tie-safe here: x*10^scale lands within 1 ulp of
    an integer, never near .5, so HALF_UP (Spark) and half-away-from-
    zero (DuckDB) agree."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale), 0).cast("long")


def cents_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(round(({expr}) * {10**scale}) AS BIGINT)"


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """sum(integer cents) — exact, order-independent; emitted as double."""
    return (F.sum(cents(col, scale)) / (10**scale)).cast("double")


def exact_avg(col: str | Column, scale: int = 2, round_to: int = 2) -> Column:
    """Truncated mean at ``round_to`` decimals, bit-identical everywhere.

    ``round()`` after a double division is NOT cross-engine stable: a
    quotient landing exactly on a half-cent tie rounds differently in
    Spark (HALF_UP on the exact expansion) vs DuckDB (scaled float
    round). ``floor`` has no tie behavior, and both engines perform the
    same IEEE double division on the same exact integer inputs, so
    ``floor(10^r * cents_sum / (10^s * count)) / 10^r`` is deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = 10**round_to
    return (
        F.floor(
            (F.lit(m) * F.sum(cents(c, scale)))
            / (F.lit(10**scale) * F.count(c))
        )
        / m
    ).cast("double")


def sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(sum({cents_sql(expr, scale)}) AS DOUBLE) / {10**scale}"


def avg_sql(expr: str, scale: int = 2, round_to: int = 2) -> str:
    m = 10**round_to
    return (
        f"CAST(floor(CAST({m} * sum({cents_sql(expr, scale)}) AS DOUBLE)"
        f" / ({10**scale} * count({expr}))) / {m} AS DOUBLE)"
    )


def revenue(price: str, discount: str) -> Column:
    """sum(price * (1 - discount)) in exact integer arithmetic:
    price-cents × (100 − discount-cents) summed as LONG, one double
    division at the end. The TPC-H revenue expression without decimal
    slow paths or float divergence."""
    return (
        F.sum(cents(price) * (F.lit(100) - cents(discount))) / 10_000
    ).cast("double")


def revenue_sql(price: str, discount: str) -> str:
    return (
        f"CAST(sum({cents_sql(price)} * (100 - {cents_sql(discount)})) "
        f"AS DOUBLE) / 10000"
    )


def dec(col: str | Column, scale: int = 2) -> Column:
    """Lossless decimal view of a 2-decimal-valued double column — for
    callers that need true DECIMAL semantics (e.g. interop with decimal-
    typed lakehouse columns). Prefer ``cents`` in aggregations."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")
