"""Engine-stable integer math primitives.

isqrt: floor(sqrt(x)) for non-negative BIGINT x, exact in BOTH Spark
and DuckDB despite going through the engines' double sqrt. The trick:
for x < 2^62, sqrt(x) <= 2^31 and IEEE double sqrt is correctly
rounded, so the float result is within < 1 of the true root — and the
two engines may still disagree by 1 after their different
double->BIGINT casts (Spark TRUNCATES, DuckDB rounds half-even). One
symmetric correction step lands both on the exact floor root:

    s0 = CAST(sqrt(x) AS BIGINT)                 -- within +-1 of isqrt
    s  = s0 + [ (s0+1)^2 <= x ] - [ s0^2 > x ]   -- exact isqrt(x)

The two predicates cannot both fire, and each fixes exactly the +-1
case, so any s0 in {isqrt-1, isqrt, isqrt+1} corrects to isqrt.
Pure 64-bit integer compares — no extra precision needed because
(s0+1)^2 <= (2^31+1)^2 < 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def isqrt_sql(x: str) -> str:
    """Exact floor(sqrt(x)) as a SQL expression over a non-negative
    integer expression x < 2^62. Valid in Spark SQL and DuckDB
    verbatim (both have sqrt/CAST; the correction step absorbs their
    different double->int cast rounding)."""
    s0 = f"CAST(sqrt(CAST(({x}) AS DOUBLE)) AS BIGINT)"
    return (
        f"({s0} + (CASE WHEN ({s0} + 1) * ({s0} + 1) <= ({x})"
        f" THEN 1 ELSE 0 END)"
        f" - (CASE WHEN {s0} * {s0} > ({x}) THEN 1 ELSE 0 END))"
    )


def isqrt(col: Column) -> Column:
    """Column form of isqrt_sql."""
    s0 = F.sqrt(col.cast("double")).cast("long")
    return (
        s0
        + F.when((s0 + 1) * (s0 + 1) <= col, F.lit(1)).otherwise(F.lit(0))
        - F.when(s0 * s0 > col, F.lit(1)).otherwise(F.lit(0))
    )
