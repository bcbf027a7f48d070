"""Engine-stable double -> DECIMAL(12,10) quantization.

Why this exists: a plain `CAST(double AS DECIMAL(12,10))` is NOT
cross-engine deterministic on exact decimal ties. A dyadic embedding
value like -0.27392578125 (= -561/2048, exactly representable in
binary) sits exactly halfway between two scale-10 decimals; Spark's
cast rounds half AWAY from zero (BigDecimal HALF_UP on the shortest
string repr) while DuckDB rounds half to even — the two engines emit
-0.2739257813 vs -0.2739257812 and every downstream exact-decimal
distance diverges in the last ulp.

The fix is to quantize with PURE IEEE arithmetic that both engines
define identically:

    q = floor(x * 1e10 + 0.5)        -- double product, double add,
                                     -- exact floor: bit-identical
    dec = CAST(q AS DECIMAL) * 1e-10 -- exact integer scaling

`x * 1e10` and `+ 0.5` are single IEEE-754 operations — any engine
computes the same bits — and floor/int-scaling are exact, so the
quantized decimal is engine-independent by construction (the rounding
rule it implements is "half toward +inf on the binary product", which
is as good as any other fixed rule). |x| < 100 keeps the tick in
BIGINT range and the product exact w.r.t. overflow.

Used by every operator that loads `embeddings.embedding`
(similarity / linalg) and mirrored verbatim in the DuckDB oracles.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

def dec10_scalar(x: Column) -> Column:
    """One double -> DECIMAL(12,10), engine-stable."""
    # literals built per-call: F.lit needs an active session
    return (
        F.floor(x * F.lit(1e10) + F.lit(0.5)).cast("decimal(20,0)")
        * F.lit(Decimal("0.0000000001"))
    ).cast("decimal(12,10)")


def dec10_array(col: Column) -> Column:
    """array<float|double> -> array<decimal(12,10)>, engine-stable."""
    return F.transform(col.cast("array<double>"), dec10_scalar)


# DuckDB spelling of the same formula (BIGINT ticks * exact 1e-10).
DUCK_DEC10_LIST_TMPL = (
    "list_transform(CAST({col} AS DOUBLE[]),"
    " x -> CAST(CAST(floor(x * 1e10 + 0.5) AS BIGINT)"
    " * CAST(0.0000000001 AS DECIMAL(11,10)) AS DECIMAL(12,10)))"
)


def duck_dec10_list(col_sql: str) -> str:
    return DUCK_DEC10_LIST_TMPL.format(col=col_sql)
