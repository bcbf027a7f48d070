"""Data-layout operators: Z-order (Morton) clustering for multi-dim
data skipping.

Not in the reference (it is a connector); part of the 100 TB pipeline
surface: a table queried by two independent keys (e.g. partkey AND
suppkey) cannot be range-clustered for both at once — sorting by an
interleaved-bit Morton code gives every dimension locality, so parquet
row-group min/max statistics prune on either predicate. This is the
layout trick behind Delta/Iceberg Z-ORDER table maintenance, expressed
as a plain Catalyst projection + repartitionByRange write.

Scale notes: the Morton code is a pure per-row bit expression (codegen,
no Python, no shuffle); the only shuffle in a real re-layout job is the
final repartitionByRange(zkey) before the write — exactly the shuffle
any global clustering requires. Callers at web scale should first rank
each dimension into a fixed bit budget (ntile or quantile buckets);
here the fixture keys already fit 16 bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale16_sql(expr: str, vmax: int | str) -> str:
    """Scale a non-negative integer expression with known max into the
    16-bit Morton domain using exact integer arithmetic. Z-order only
    delivers balanced locality when every dimension spans the SAME bit
    width — interleaving a 7-bit key with an 11-bit key degenerates to
    a sort on the wider key's high bits (measured: supp_span 99 vs 19
    after normalization on the fixture). At web scale, derive vmax from
    a stats pass or rank-normalize with ntile.

    FLOOR over double division is used because Spark spells integer
    division DIV while DuckDB spells it // — whereas this expression is
    valid in BOTH dialects, and IEEE division is correctly rounded in
    both engines, so the result is still bit-deterministic."""
    return f"CAST(FLOOR((({expr}) * 65535.0) / {vmax}) AS BIGINT)"


def morton_expr_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """SQL text for the interleaved Morton code of two non-negative
    integer expressions (low `bits` of each; x takes even bit lanes,
    y odd). Plain shifts/ands — identical syntax evaluates in Spark SQL
    and DuckDB, which is what makes the layout report hash-checkable."""
    x = f"CAST({x_expr} AS BIGINT)"  # INT inputs would wrap at << 31
    y = f"CAST({y_expr} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def morton_code(x_expr: str, y_expr: str, bits: int = 16) -> Column:
    """Morton code as a Column (see morton_expr_sql)."""
    return F.expr(morton_expr_sql(x_expr, y_expr, bits))


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    partitions: int | None = None,
    x_max: int | None = None,
    y_max: int | None = None,
) -> DataFrame:
    """Re-layout `df` for two-dimensional data skipping: attach the
    Morton key and range-partition + sort by it (ready for a parquet
    write whose file/row-group min/max stats prune on BOTH x and y).

    Pass x_max/y_max (the dimension maxima, e.g. from a stats pass) to
    scale both keys into the common 16-bit domain first — REQUIRED for
    balanced locality whenever the two keys span different ranges
    (see scale16_sql); without them the raw low bits interleave,
    which is only correct for keys already in [0, 2^bits)."""
    x = scale16_sql(x_col, x_max) if x_max is not None else x_col
    y = scale16_sql(y_col, y_max) if y_max is not None else y_col
    z = df.withColumn("zkey", morton_code(x, y, bits))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return z.repartitionByRange(parts, "zkey").sortWithinPartitions("zkey")


def scale_sql(expr: str, vmax: int | str, bits: int) -> str:
    """scale16_sql generalized to any bit budget (Hilbert uses 8 bits
    per dimension so the 2D index fits 16 bits; same exactness
    argument — FLOOR over correctly-rounded IEEE division is
    bit-deterministic in both engines)."""
    top = (1 << bits) - 1
    return f"CAST(FLOOR((({expr}) * {top}.0) / {vmax}) AS BIGINT)"


def hilbert_cols(df: DataFrame, order: int = 8) -> DataFrame:
    """Attach the Hilbert curve index `hkey` to a DataFrame with
    integer columns hx, hy in [0, 2^order): the standard xy2d bit
    walk (per bit: quadrant digit (3*rx) XOR ry, then reflect+swap
    rotation), unrolled into `order` Catalyst projection layers —
    pure per-row integer expressions, whole-stage-codegen'd, no
    Python, no shuffle.

    Hilbert beats Morton for range skipping because the curve never
    jumps: every consecutive pair of cells is grid-adjacent, so a
    contiguous key run maps to a compact blob (Morton's Z-jumps
    scatter a run across the grid — measurably wider per-bucket
    min/max spans on the report). The tradeoff is this rotation
    state machine vs one interleave expression."""
    n = 1 << order
    out = df.withColumn("hkey", F.lit(0).cast("long"))
    for i in range(order - 1, -1, -1):
        s = 1 << i
        out = (
            out.withColumn("rx", F.expr(f"CAST((hx >> {i}) & 1 AS INT)"))
            .withColumn("ry", F.expr(f"CAST((hy >> {i}) & 1 AS INT)"))
            .withColumn(
                "hkey",
                F.expr(
                    f"hkey + CAST({s * s} AS BIGINT) *"
                    " (CASE WHEN rx = 0 AND ry = 0 THEN 0"
                    "       WHEN rx = 0 AND ry = 1 THEN 1"
                    "       WHEN rx = 1 AND ry = 1 THEN 2"
                    "       ELSE 3 END)"
                ),
            )
            .withColumn(
                "nx",
                F.expr(
                    "CASE WHEN ry = 0 THEN"
                    f" (CASE WHEN rx = 1 THEN {n - 1} - hy ELSE hy END)"
                    " ELSE hx END"
                ),
            )
            .withColumn(
                "ny",
                F.expr(
                    "CASE WHEN ry = 0 THEN"
                    f" (CASE WHEN rx = 1 THEN {n - 1} - hx ELSE hx END)"
                    " ELSE hy END"
                ),
            )
            .withColumn("hx", F.col("nx"))
            .withColumn("hy", F.col("ny"))
            .drop("nx", "ny", "rx", "ry")
        )
    return out


def hilbert_sql_layers(
    inner_sql: str, passthrough: list[str], order: int = 8
) -> str:
    """The same xy2d bit walk as nested-SELECT DuckDB SQL (for oracle
    replay): `inner_sql` must yield columns hx, hy plus `passthrough`;
    returns SQL yielding passthrough + hkey."""
    n = 1 << order
    cols = ", ".join(passthrough)
    q = f"SELECT {cols}, hx, hy, CAST(0 AS BIGINT) AS hkey FROM ({inner_sql})"
    for i in range(order - 1, -1, -1):
        s = 1 << i
        q = (
            f"SELECT {cols}, hx, hy, hkey,"
            f" CAST((hx >> {i}) & 1 AS INT) AS rx,"
            f" CAST((hy >> {i}) & 1 AS INT) AS ry FROM ({q})"
        )
        q = (
            f"SELECT {cols},"
            " CASE WHEN ry = 0 THEN"
            f" (CASE WHEN rx = 1 THEN {n - 1} - hy ELSE hy END)"
            " ELSE hx END AS hx,"
            " CASE WHEN ry = 0 THEN"
            f" (CASE WHEN rx = 1 THEN {n - 1} - hx ELSE hx END)"
            " ELSE hy END AS hy,"
            f" hkey + CAST({s * s} AS BIGINT) *"
            " (CASE WHEN rx = 0 AND ry = 0 THEN 0"
            "       WHEN rx = 0 AND ry = 1 THEN 1"
            "       WHEN rx = 1 AND ry = 1 THEN 2"
            "       ELSE 3 END) AS hkey"
            f" FROM ({q})"
        )
    return f"SELECT {cols}, hkey FROM ({q})"


def hilbert_xy2d_py(order: int, x: int, y: int) -> int:
    """Pure-Python witness of the same xy2d walk (tests pin the Spark
    expression and the SQL layers to this)."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d
