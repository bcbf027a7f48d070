"""Distributed linear algebra on DataFrames: the PCA power iteration.

Embedding pipelines whiten / reduce / health-check their vector spaces
with the top principal component(s); at cluster scale the scatter
matrix is a map-side-combined aggregation and the power iteration is a
sequence of (dim^2 x dim)-sized joins — data-sized work happens exactly
once, in the scatter pass.

Exactness design (what makes this oracle-checkable when textbook PCA is
float-order-dependent):
- the mean vector and the scatter matrix S = sum (x-mu)(x-mu)^T are
  exact DECIMAL sums (order-independent), with every scale budgeted so
  Spark's 38-digit cap is never hit: cells quantize to DECIMAL(16,12);
- each power step A.v runs in decimal — products (16,12)x(12,10), an
  exact (38,22) sum — then the new vector is re-quantized to
  DECIMAL(12,10) after dividing by its norm;
- the ONLY floating point is sqrt (IEEE exact-rounded) and fixed-order
  double divisions, so both engines produce bit-identical vectors at
  every iteration;
- deterministic start: the coordinate basis vector of the
  highest-variance dimension (argmax of diag(S), ties to the lowest
  index) — no RNG;
- sign canonicalization: the component with the largest |value|
  (ties to the lowest index) is made positive.

The eigenvalue is the Rayleigh quotient v^T S v / v^T v of the final
quantized vector; explained_ratio = lambda / trace(S) (the 1/(n-1)
normalizations cancel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

D1610 = T.DecimalType(12, 10)
DCELL = T.DecimalType(16, 12)


def scatter_matrix(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """(S, mu): exact-decimal scatter matrix cells (i, j, s) and the
    mean vector (i, m). One pass for the mean, one explode pass of
    dim^2 products per row (map-side combined to dim^2 cells)."""
    x = df.select(
        F.col(vec_col)
        .cast("array<double>")
        .cast("array<decimal(12,10)>")
        .alias("v")
    )
    n = x.count()
    # the mean must come from an EXACT decimal sum — a double sum is
    # partition-order-dependent in the last ulp
    mu = (
        x.select(F.posexplode("v").alias("i", "xi"))
        .groupBy("i")
        .agg(
            F.round(F.sum("xi").cast("double") / F.lit(n), 10)
            .cast(D1610)
            .alias("m")
        )
    )
    mu_rows = {r["i"]: r["m"] for r in mu.collect()}
    dim = len(mu_rows)
    mu_arr = F.array(
        *[F.lit(str(mu_rows[i])).cast(D1610) for i in range(dim)]
    )
    centered = x.select(
        F.zip_with(
            F.col("v"), mu_arr, lambda a, b: (a - b).cast(D1610)
        ).alias("c")
    )
    cells = (
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
        .agg(F.sum("e.p").cast(DCELL).alias("s"))
    )
    return cells, mu


def pca_top_component(
    df: DataFrame, vec_col: str = "embedding", iters: int = 6
) -> DataFrame:
    """Top principal component by power iteration over the exact
    scatter matrix. Returns one row: (lambda1, trace, explained_ratio,
    n_iters) plus the first four canonicalized eigenvector components
    (v0..v3), everything rounded to 6 dp for output."""
    spark = df.sparkSession
    cells, _mu = scatter_matrix(df, vec_col)
    cells = cells.localCheckpoint()  # S is dim^2 rows — model-sized
    # deterministic start: basis vector of the max-variance dimension
    seed = (
        cells.where(F.col("i") == F.col("j"))
        .orderBy(F.desc("s"), "i")
        .limit(1)
        .collect()[0]["i"]
    )
    dim = cells.agg(F.max("i")).collect()[0][0] + 1
    v = spark.createDataFrame(
        [(j, "1" if j == seed else "0") for j in range(dim)],
        "j INT, vs STRING",
    ).select("j", F.col("vs").cast(D1610).alias("v"))
    for _ in range(iters):
        av = (
            cells.join(v, cells["j"] == v["j"])
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("v")).alias("raw"))
            .select("i", F.col("raw").cast(T.DecimalType(16, 8)).alias("w"))
        )
        norm2 = av.agg(
            F.sum(F.col("w") * F.col("w")).alias("n2")
        ).select(F.sqrt(F.col("n2").cast("double")).alias("nrm"))
        v = (
            av.crossJoin(F.broadcast(norm2))
            .select(
                F.col("i").alias("j"),
                F.round(
                    F.col("w").cast("double") / F.col("nrm"), 10
                ).cast(D1610).alias("v"),
            )
        ).localCheckpoint()
    # sign canonicalization + Rayleigh quotient
    pivot = (
        v.orderBy(F.abs(F.col("v")).desc(), "j").limit(1)
        .select(F.when(F.col("v") < 0, -1).otherwise(1).alias("sgn"))
    )
    v = v.crossJoin(F.broadcast(pivot)).select(
        "j", (F.col("v") * F.col("sgn")).cast(D1610).alias("v")
    )
    sv = (
        cells.join(v.select(F.col("j"), F.col("v").alias("vj")), "j")
        .groupBy("i")
        .agg(
            F.sum(F.col("s") * F.col("vj"))
            .cast(T.DecimalType(16, 8))
            .alias("svi")
        )
    )
    num = (
        sv.join(v.select(F.col("j").alias("i"), F.col("v").alias("vi")), "i")
        .agg(F.sum(F.col("svi") * F.col("vi")).alias("vsv"))
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    tr = cells.where(F.col("i") == F.col("j")).agg(
        F.sum("s").alias("trace")
    )
    comps = v.where(F.col("j") < 4).groupBy().pivot("j", [0, 1, 2, 3]).agg(
        F.first("v")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tr))
        .select(
            F.round(d("vsv") / d("vv"), 6).alias("lambda1"),
            F.round(d("trace"), 6).alias("trace"),
            F.round((d("vsv") / d("vv")) / d("trace"), 6).alias(
                "explained_ratio"
            ),
            F.lit(iters).alias("n_iters"),
        )
        .crossJoin(F.broadcast(comps))
        .select(
            "lambda1", "trace", "explained_ratio", "n_iters",
            F.round(F.col("0").cast("double"), 6).alias("v0"),
            F.round(F.col("1").cast("double"), 6).alias("v1"),
            F.round(F.col("2").cast("double"), 6).alias("v2"),
            F.round(F.col("3").cast("double"), 6).alias("v3"),
        )
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
    first-line anomaly filter for corrupt/degenerate embeddings (a
    vector far out along the dominant axis of variation). Reuses the
    exact-decimal scatter/power machinery; the per-row score is an
    exact decimal dot product of the centered vector with the
    quantized, sign-canonicalized eigenvector (model-sized literals),
    so scores and ranking are bit-reproducible. One data pass beyond
    training."""
    from pyspark.sql import Window

    spark = df.sparkSession
    cells, mu = scatter_matrix(df, vec_col)
    cells = cells.localCheckpoint()
    seed = (
        cells.where(F.col("i") == F.col("j"))
        .orderBy(F.desc("s"), "i")
        .limit(1)
        .collect()[0]["i"]
    )
    dim = cells.agg(F.max("i")).collect()[0][0] + 1
    v = spark.createDataFrame(
        [(j, "1" if j == seed else "0") for j in range(dim)],
        "j INT, vs STRING",
    ).select("j", F.col("vs").cast(D1610).alias("v"))
    for _ in range(iters):
        av = (
            cells.join(v, cells["j"] == v["j"])
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("v")).alias("raw"))
            .select("i", F.col("raw").cast(T.DecimalType(16, 8)).alias("w"))
        )
        norm2 = av.agg(F.sum(F.col("w") * F.col("w")).alias("n2")).select(
            F.sqrt(F.col("n2").cast("double")).alias("nrm")
        )
        v = (
            av.crossJoin(F.broadcast(norm2)).select(
                F.col("i").alias("j"),
                F.round(F.col("w").cast("double") / F.col("nrm"), 10)
                .cast(D1610)
                .alias("v"),
            )
        ).localCheckpoint()
    rows = sorted(
        v.collect(), key=lambda r: (-abs(r["v"]), r["j"])
    )
    sgn = -1 if rows[0]["v"] < 0 else 1
    vs = {r["j"]: r["v"] * sgn for r in v.collect()}
    mu_rows = {r["i"]: r["m"] for r in mu.collect()}
    v_arr = F.array(*[F.lit(str(vs[j])).cast(D1610) for j in range(dim)])
    mu_arr = F.array(
        *[F.lit(str(mu_rows[i])).cast(D1610) for i in range(dim)]
    )
    acc_t = T.DecimalType(38, 20)
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>").cast("array<decimal(12,10)>"),
        mu_arr,
        lambda a, b: (a - b).cast(D1610),
    )
    score = F.aggregate(
        F.zip_with(centered, v_arr, lambda a, b: (a * b).cast(acc_t)),
        F.lit(0).cast(acc_t),
        lambda acc, x: (acc + x).cast(acc_t),
    )
    # TakeOrdered top-k (never a global row_number window over the
    # corpus); rank is attached to the k-row result afterwards
    top = (
        df.select(F.col(id_col).alias("vid"), score.alias("sc"))
        .orderBy(
            F.round(F.abs(F.col("sc")).cast("double"), 12).desc(),
            F.col("vid"),
        )
        .limit(k)
    )
    w = Window.orderBy(
        F.round(F.abs(F.col("sc")).cast("double"), 12).desc(),
        F.col("vid"),
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("vid").alias(id_col),
        F.round(F.col("sc").cast("double"), 6).alias("score"),
        "rank",
    )
