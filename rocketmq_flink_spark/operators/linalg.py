"""Distributed linear algebra on DataFrames: PCA power iteration in
PURE INTEGER arithmetic.

Embedding pipelines whiten / reduce / health-check their vector spaces
with the top principal component(s); at cluster scale the covariance
matrix is ONE map-side-combined aggregation (the only data-sized work)
and the power iteration is model-sized (dim^2 cells).

Exactness design — this operator contains NO floating point and NO
decimal scale-reduction casts anywhere. Both were removed after round-4
cross-engine findings:
  * `ROUND(double, k)` disagrees between engines in the last ulp
    (Spark rounds the shortest-string repr half-up; DuckDB rounds the
    binary value), so any double in the chain eventually breaks a hash
    gate;
  * decimal DOWNCASTS disagree too: Spark rounds HALF_UP, DuckDB 1.0
    TRUNCATES toward zero (verified: CAST(1.9999999999995 AS
    DECIMAL(16,12)) -> 2.000000000000 vs 1.999999999999). A power
    iteration self-corrects mid-chain divergence (which is why earlier
    rounds stayed green), but the Rayleigh quotient surfaces it.

Instead every quantity is an exact INTEGER in fixed tick units, and
every rounding is explicit rational arithmetic, identical by
construction in Python, Spark SQL, and DuckDB SQL:

    half_up(u / d)  =  sign(u) * ((2*|u| + d) // (2*d))
    trunc (u / d)   =  sign(u) * (|u| // d)

Pipeline (ticks in parentheses):
  - inputs land on the DECIMAL(12,10) grid via the engine-stable floor
    formula (functions/quant.py), i.e. integer ticks of 1e-10;
  - mean:      mu_i  = half_up(sum_ticks / n)                 (1e-10)
  - centered:  c_i   = x_i - mu_i                             (1e-10)
  - covariance cells: s_ij = half_up(sum(c_i c_j) / (n*1e8))  (1e-12)
    — normalizing by n INSIDE the cell keeps |s| < max|x|^2 at ANY
    row count (a raw scatter sum grows with n and would overflow its
    type past ~1e4 unit-variance rows);
  - power step: raw_i = sum_j s_ij v_j                        (1e-22)
                v_i   = half_up(raw_i * 1e10 / max|raw|)      (1e-10)
    — max-norm instead of L2-norm: no sqrt, same fixed point
    direction, and the Rayleigh quotient is normalization-invariant;
  - Rayleigh:  t_i  = trunc(sum_j s_ij v_j / 1e6)             (1e-16)
               vsv  = sum t_i v_i                             (1e-26)
               den  = sum v_i^2                               (1e-20)
               lambda1 = half_up(vsv / den) ticks of          (1e-6)
  - outputs are integer 1e-6 ticks cast to DOUBLE and divided by 1e6 —
    both exact IEEE ops, bit-identical everywhere.

The model-sized iteration runs driver-side on the collected dim^2
cells (the same driver-sync class as any centroid/seed collect); the
DuckDB oracle replays the identical integer recurrence in staged
HUGEINT CTEs. int128 bounds for the SQL replay: dim * max|cov| must
stay under ~8.5e5 (dim<=85 at the DECIMAL(16,12) cell-type cap, far
wider for unit-scale embeddings); the Python side is unbounded.

lambda1 is the covariance eigenvalue; explained_ratio = lambda1/trace
(identical to the scatter-matrix ratio — 1/n cancels).
"""

from __future__ import annotations

import decimal
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D10 = "decimal(12,10)"


def _half_up(u: int, d: int) -> int:
    q = (2 * abs(u) + d) // (2 * d)
    return q if u >= 0 else -q


def _trunc(u: int, d: int) -> int:
    q = abs(u) // d
    return q if u >= 0 else -q


def exact_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, int, dict[int, int], dict[tuple[int, int], int]]:
    """The distributed passes: (n, dim, mu ticks 1e-10, covariance
    cells ticks 1e-12), all exact integers.

    Pass 1 sums each coordinate (exact decimal scale 10); pass 2
    explodes dim^2 centered products per row, map-side combined to
    dim^2 exact sums. Only these touch data; everything after is
    model-sized."""
    from rocketmq_flink_spark.functions.quant import dec10_array

    x = df.select(dec10_array(F.col(vec_col)).alias("v"))
    n = x.count()
    sums = (
        x.select(F.posexplode("v").alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum("xi").alias("sx"))  # exact decimal, scale 10
    )
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        mu = {
            r["i"]: _half_up(int(Decimal(r["sx"]).scaleb(10)), n)
            for r in sums.collect()
        }
    dim = len(mu)
    mu_arr = F.array(
        *[
            F.lit(str(Decimal(mu[i]).scaleb(-10))).cast(D10)
            for i in range(dim)
        ]
    )
    centered = x.select(
        F.zip_with(
            F.col("v"), mu_arr, lambda a, b: (a - b).cast(D10)
        ).alias("c")
    )
    raw = (
        centered.select(
            F.explode(
                F.expr(
                    "flatten(transform(c, (xi, i) ->"
                    " transform(c, (xj, j) ->"
                    " struct(i AS i, j AS j, xi * xj AS p))))"
                )
            ).alias("e")
        )
        .groupBy("e.i", "e.j")
        .agg(F.sum("e.p").alias("p"))  # exact decimal, scale 20
    )
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        cells = {
            (r["i"], r["j"]): _half_up(
                int(Decimal(r["p"]).scaleb(20)), n * 10**8
            )
            for r in raw.collect()
        }
    return n, dim, mu, cells


def _power_iteration(
    cells: dict[tuple[int, int], int], dim: int, iters: int
) -> tuple[list[int], int]:
    """Integer power iteration; returns (v ticks 1e-10, iters run).
    Seed = basis vector of the max-variance dimension (ties lowest)."""
    seed = max(range(dim), key=lambda i: (cells.get((i, i), 0), -i))
    v = [10**10 if j == seed else 0 for j in range(dim)]
    for _ in range(iters):
        raw = [
            sum(cells.get((i, j), 0) * v[j] for j in range(dim))
            for i in range(dim)
        ]
        wmax = max(abs(r) for r in raw)
        if wmax == 0:
            break
        v = [_half_up(r * 10**10, wmax) for r in raw]
    # sign canonicalization: largest |component| (ties lowest j) > 0
    pivot = max(range(dim), key=lambda j: (abs(v[j]), -j))
    if v[pivot] < 0:
        v = [-x for x in v]
    return v, iters


def pca_train(
    df: DataFrame, vec_col: str = "embedding", iters: int = 6
) -> dict:
    """Shared trainer: exact moments + integer power iteration +
    integer Rayleigh quotient. Returns a dict of integer results
    (ticks noted per field)."""
    n, dim, mu, cells = exact_moments(df, vec_col)
    v, _ = _power_iteration(cells, dim, iters)
    t = [
        _trunc(
            sum(cells.get((i, j), 0) * v[j] for j in range(dim)), 10**6
        )
        for i in range(dim)
    ]
    vsv = sum(t[i] * v[i] for i in range(dim))  # ticks 1e-26
    den = sum(x * x for x in v)  # ticks 1e-20
    tr = sum(cells.get((i, i), 0) for i in range(dim))  # ticks 1e-12
    lam6 = _half_up(vsv, den) if den else 0  # ticks 1e-6
    tr6 = _half_up(tr, 10**6)  # ticks 1e-6
    exp6 = _half_up(lam6 * 10**12, tr) if tr else 0  # ticks 1e-6
    return {
        "n": n,
        "dim": dim,
        "mu": mu,
        "cells": cells,
        "v": v,
        "lam6": lam6,
        "tr6": tr6,
        "exp6": exp6,
    }


def pca_top_component(
    df: DataFrame, vec_col: str = "embedding", iters: int = 6
) -> DataFrame:
    """Top principal component of the covariance matrix by integer
    power iteration. One row: (lambda1, trace, explained_ratio,
    n_iters, v0..v3), every value an exact 1e-6 tick rendered as
    DOUBLE (integer-to-double conversion and /1e6 are exact IEEE —
    no engine-dependent rounding anywhere)."""
    m = pca_train(df, vec_col, iters)
    v6 = [_half_up(x, 10**4) for x in m["v"][:4]]  # 1e-10 -> 1e-6
    row = [
        (
            m["lam6"],
            m["tr6"],
            m["exp6"],
            iters,
            v6[0] if len(v6) > 0 else 0,
            v6[1] if len(v6) > 1 else 0,
            v6[2] if len(v6) > 2 else 0,
            v6[3] if len(v6) > 3 else 0,
        )
    ]
    t6 = (
        "lam6 LONG, tr6 LONG, exp6 LONG, n_iters INT, "
        "w0 LONG, w1 LONG, w2 LONG, w3 LONG"
    )
    out = df.sparkSession.createDataFrame(row, t6)
    tick = lambda c: (F.col(c).cast("double") / F.lit(1e6))  # noqa: E731
    return out.select(
        tick("lam6").alias("lambda1"),
        tick("tr6").alias("trace"),
        tick("exp6").alias("explained_ratio"),
        F.col("n_iters"),
        tick("w0").alias("v0"),
        tick("w1").alias("v1"),
        tick("w2").alias("v2"),
        tick("w3").alias("v3"),
    )


def pca_projection_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 6,
    k: int = 10,
) -> DataFrame:
    """Embedding outlier report: the k vectors with the largest
    |projection| onto the top principal component — the cheap
    first-line anomaly filter for corrupt/degenerate embeddings.

    The per-row score is an exact INTEGER dot product: centered ticks
    (1e-10, from the model-sized mean literal) times eigenvector ticks
    (1e-10), accumulated in DECIMAL(38,0) — ticks of 1e-20, exact at
    any dim < 1e14. Ranking compares those integers directly (no
    rounding in the ORDER BY at all); the reported score is the 1e-6
    half-up tick as DOUBLE. One data pass beyond training, TakeOrdered
    top-k — never a global window over the corpus."""
    from pyspark.sql import Window

    from rocketmq_flink_spark.functions.quant import dec10_array

    m = pca_train(df, vec_col, iters)
    dim, mu, v = m["dim"], m["mu"], m["v"]
    mu_arr = F.array(
        *[
            F.lit(str(Decimal(mu[i]).scaleb(-10))).cast(D10)
            for i in range(dim)
        ]
    )
    v_arr = F.array(*[F.lit(v[j]).cast("long") for j in range(dim)])
    # centered ticks: (dec10(x) - mu) * 1e10 is integral by
    # construction -> exact BIGINT
    c_ticks = F.zip_with(
        dec10_array(F.col(vec_col)),
        mu_arr,
        lambda a, b: ((a - b) * F.lit(10_000_000_000)).cast("long"),
    )
    acc = "decimal(38,0)"
    score = F.aggregate(
        F.zip_with(
            c_ticks,
            v_arr,
            lambda a, b: (a.cast("decimal(20,0)") * b.cast("decimal(11,0)")).cast(acc),
        ),
        F.lit(0).cast(acc),
        lambda s, x: (s + x).cast(acc),
    )
    top = (
        df.select(F.col(id_col).alias("vid"), score.alias("su"))
        .orderBy(F.abs(F.col("su")).desc(), F.col("vid"))
        .limit(k)
    )
    w = Window.orderBy(F.abs(F.col("su")).desc(), F.col("vid"))
    # su ticks 1e-20 -> half-up 1e-6 ticks -> exact double
    q6 = F.expr(
        "CASE WHEN su >= 0 THEN (2 * su + 100000000000000)"
        " div 200000000000000"
        " ELSE -((-2 * su + 100000000000000) div 200000000000000) END"
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("vid").alias(id_col),
            (q6.cast("double") / F.lit(1e6)).alias("score"),
            "rank",
        )
    )
