"""Distributed probabilistic sketches: HyperLogLog and Count-Min.

Not in the reference (it is a connector); part of the training-data
pipeline surface (BASELINE.json north star): cardinality and frequency
estimation are the two sketches a 100 TB pipeline runs constantly
(vocabulary sizing, dedup-rate monitoring, heavy-hitter token caps).

Both sketches here are built from the portable 60-bit md5 hash family
(functions/porthash.py), so every register / counter value — and
therefore the final estimates — are BIT-IDENTICALLY reproducible by the
DuckDB oracle. Spark's own approx_count_distinct cannot be
oracle-checked (engine-private HLL++ registers); this one can.

Scale design
------------
- hll_registers is ONE map-side-combinable groupBy((group, bucket),
  max(rho)): the shuffle moves at most m=2^p rows per group per map
  task, regardless of input size. Registers MERGE by max — the property
  that lets a 1000-executor cluster sketch per partition and combine,
  and lets daily sketches roll up into monthly ones. hll_merge +
  the estimate being a pure function of registers makes that explicit.
- The estimator avoids BOTH classic non-determinism traps:
  * Z = sum(2^-M_j) is computed in INTEGER arithmetic (terms scaled by
    2^55 and summed as BIGINT — exact, order-independent), because a
    distributed double sum has nondeterministic addition order;
  * the low-cardinality linear-counting branch (m*ln(m/V)) is omitted —
    ln() is libm-dependent across engines — so this is the original
    raw HLL estimator; callers should size p so expected cardinality
    >= ~2.5*m (p is a parameter).
- countmin counters are ONE groupBy((row, col)) count — d*w cells
  total, additive under union (mergeable the same way). Probing joins
  candidates against the tiny sketch (broadcast by size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions.porthash import (
    P31,
    _const,
    affine31,
    affine31_sql,
    hash31,
    hash31_sql,
    hash60,
    hash60_sql,
)

HLL_BASE_BITS = 60  # width of the portable md5 base hash


def _hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, value: Column, group_cols: list[str], p: int = 6
) -> DataFrame:
    """HLL registers per group: (group..., bucket, m) with m = max rho.

    bucket = top p bits of the 60-bit portable hash; rho = 1-based
    position of the leftmost set bit in the remaining width=60-p bits
    (width+1 when they are all zero) — computed exactly via the binary
    string length (floor(log2) in integer domain), no floating point."""
    width = HLL_BASE_BITS - p
    base = hash60(value)
    bucket = F.shiftright(base, width).alias("bucket")
    rest = base % F.lit(1 << width).cast("long")
    rho = (
        F.when(rest == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return df.groupBy(*group_cols, bucket).agg(F.max(rho).alias("m"))


def hll_merge(reg: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge registers that were sketched separately (e.g. per shard or
    per day): max per (group, bucket). Lossless — merged registers are
    identical to sketching the union directly."""
    return reg.groupBy(*group_cols, "bucket").agg(F.max("m").alias("m"))


def hll_estimate(
    reg: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Raw HLL estimate per group from a register frame.

    Z is assembled in exact BIGINT arithmetic: each register contributes
    2^(S-M_j) with S = width+1, absent buckets contribute 2^S, so
    Z_scaled = sum + (m - n_buckets) * 2^S and
    E = alpha * m^2 * 2^S / Z_scaled with one double division at the
    end — deterministic regardless of row order or partitioning."""
    m = 1 << p
    width = HLL_BASE_BITS - p
    s = width + 1
    # SQL-text shiftleft: the Python F.shiftleft only takes a literal
    # shift amount, but Catalyst's ShiftLeft accepts a column.
    zs = (
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - m)"))
        + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << s).cast("long")
    )
    alpha = _hll_alpha(m)
    est = F.round(
        F.lit(alpha * m * m) * F.lit(float(1 << s)) / zs.cast("double"), 4
    )
    return reg.groupBy(*group_cols).agg(est.alias("est_distinct"))


def hll_registers_sql(
    value_expr: str, from_clause: str, group_expr: str, p: int = 6
) -> str:
    """DuckDB replay of hll_registers (same bucket/rho arithmetic)."""
    width = HLL_BASE_BITS - p
    base = hash60_sql(value_expr)
    return f"""
      SELECT {group_expr} AS grp,
             ({base} >> {width}) AS bucket,
             MAX(CASE WHEN ({base} % {1 << width}::BIGINT) = 0
                      THEN {width + 1}
                      ELSE {width + 1}
                           - length(bin({base} % {1 << width}::BIGINT))
                 END) AS m
      {from_clause}
      GROUP BY 1, 2
    """


def hll_estimate_sql(registers_cte: str, p: int = 6) -> str:
    """DuckDB replay of hll_estimate over a (grp, bucket, m) CTE."""
    m = 1 << p
    s = HLL_BASE_BITS - p + 1
    alpha = _hll_alpha(m)
    return f"""
      SELECT grp,
             ROUND({alpha * m * m!r} * {float(1 << s)!r}
                   / CAST(CAST(SUM(1::BIGINT << ({s} - m)) AS BIGINT)
                          + ({m} - COUNT(*)) * {1 << s}::BIGINT AS DOUBLE),
                   4) AS est_distinct
      FROM {registers_cte} GROUP BY grp
    """


# --- Count-Min ------------------------------------------------------------

CM_D = 4  # hash rows
CM_W = 256  # counter columns per row


def cm_coeffs(d: int = CM_D) -> list[tuple[int, int]]:
    """Fixed universal-family coefficients for the d counter rows
    (independent tag from the MinHash family)."""
    return [
        (_const("cm-a", j, 1, P31), _const("cm-b", j, 0, P31))
        for j in range(d)
    ]


def countmin_sketch(
    tokens: DataFrame, token_col: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Count-Min counters (r, c, cnt) over a token column: d*w cells,
    one map-side-combined groupBy. Counters are additive — sketches of
    shards merge by summing cell-wise."""
    coeffs = cm_coeffs(d)
    x = hash31(F.col(token_col))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("r"),
                    (affine31(x, a, b) % w).cast("int").alias("c"),
                )
                for j, (a, b) in enumerate(coeffs)
            ]
        )
    ).alias("cell")
    return (
        tokens.select(cells)
        .select("cell.r", "cell.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_probe(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Point-query the sketch for each candidate token: est = min over
    the d rows of the addressed counter. The sketch is at most d*w rows
    — broadcast side of the join by construction."""
    coeffs = cm_coeffs(d)
    x = hash31(F.col(token_col))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("r"),
                    (affine31(x, a, b) % w).cast("int").alias("c"),
                )
                for j, (a, b) in enumerate(coeffs)
            ]
        )
    ).alias("cell")
    return (
        candidates.select(F.col(token_col), cells)
        .select(token_col, "cell.r", "cell.c")
        .join(F.broadcast(sketch), ["r", "c"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("cm_est"))
    )


def countmin_cells_sql(x31_expr: str, d: int = CM_D, w: int = CM_W) -> str:
    """DuckDB: LIST of [row, col] cell addresses for a token hash."""
    parts = ", ".join(
        f"[{j}, {affine31_sql(x31_expr, a, b)} % {w}]"
        for j, (a, b) in enumerate(cm_coeffs(d))
    )
    return f"[{parts}]"


__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_registers_sql",
    "hll_estimate_sql",
    "cm_coeffs",
    "countmin_sketch",
    "countmin_probe",
    "countmin_cells_sql",
    "CM_D",
    "CM_W",
]
