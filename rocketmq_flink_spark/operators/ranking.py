"""Distributed exact global rank / prefix sums — no single-partition sort.

A global ``row_number()`` / ``ntile()`` / running ``SUM`` expressed as
``Window.orderBy(...)`` with no partition spec moves the ENTIRE input
through one task (Spark warns "No Partition Defined ... Moving all data
to a single partition") — correct on 60k rows, dead at 100 TB. This
module ships the distributed exact form used by the catalog's ranked
queries:

1. bucket every row by a *deterministic* range function of an integral
   key that is monotone in the sort order (no sampling — unlike
   ``repartitionByRange``, the bucket of a row depends only on the data,
   so the plan is replayable and needs no checkpoint/persist barrier);
2. aggregate per-bucket counts/sums (map-side combinable, <= n_buckets
   rows);
3. turn those into *exclusive* per-bucket offsets with a tiny
   bucket-axis self-join (<= n_buckets^2 nested-loop rows — window-free,
   so the shipped plans contain NO partition-less WindowExec at all);
4. broadcast the offsets back and finish with a window PARTITIONED by
   bucket: offset + within-bucket row_number / running sum.

Wall-clock at scale: one extra tiny aggregate versus the single-sort
form, and the heavy sort becomes n_buckets independent partition-local
sorts. The results are exact (not approximate) — each catalog query
keeps its original DuckDB ntile/row_number/cumsum oracle bit-for-bit.

Skew note: linear range buckets assume the key is roughly spread over
[min, max] (true for the catalog's price-cents, doc-id and 60-bit-hash
keys). For adversarial key distributions, swap step 1's linear split
for approx-quantile cutpoints — the rest of the pipeline is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_prefix", "distributed_ntile", "ntile_from_pos_sql"]


def distributed_prefix(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket_col: str,
    sum_cols: Sequence[str] = (),
    pos_col: str | None = None,
    max_cols: Sequence[str] = (),
    max_cols_excl: Sequence[str] = (),
    n_buckets: int = 64,
    extra_agg: dict[str, Column] | None = None,
    domain: tuple[int, int] | None = None,
) -> DataFrame:
    """Add exact global prefix columns to ``df`` without a global sort.

    order_cols: the total order (must be strict — include a tiebreaker —
        wherever downstream consumes positions of tied sort keys).
    bucket_col: NAME of an integral (long) column in ``df`` that is
        monotone non-decreasing in the sort order (typically the first
        order column, or a fixed-point projection of it).
    sum_cols:  integral columns to accumulate; each yields ``cum_<c>``
        (inclusive running sum in sort order).
    pos_col:   if set, adds the global 1-based row number.
    max_cols:  columns yielding ``cummax_<c>`` — the inclusive running
        max (high-water-mark) in sort order.
    max_cols_excl: columns yielding ``cummaxx_<c>`` — the EXCLUSIVE
        running max (over strictly earlier rows; NULL on the global
        first row, exactly like MAX OVER (... AND 1 PRECEDING)).
    extra_agg: optional {name: agg Column} piggybacked onto the bounds
        pass and broadcast onto every output row — lets callers that
        also need a global scalar (e.g. the total count for ntile)
        avoid a second full scan; the caller drops the column.
    domain: optional (lo, hi) literal bounds of bucket_col, when the
        caller knows the key domain statically (e.g. a 16-bit Morton /
        Hilbert code). Skips the min/max stats pass entirely, so an
        expensive key expression is evaluated one fewer time.
    """
    if not sum_cols and not max_cols and not max_cols_excl and (
        pos_col is None
    ):
        raise ValueError("nothing to compute: pass sum/max cols or pos_col")
    mset = sorted(set(max_cols) | set(max_cols_excl))
    if domain is not None:
        lo, hi = int(domain[0]), int(domain[1])
        width = (hi - lo) // int(n_buckets) + 1
        b = df.withColumn(
            "_rk_bkt",
            F.expr(f"CAST(({bucket_col} - {lo}) DIV {width} AS INT)"),
        )
        if extra_agg:
            ex = df.agg(*[c.alias(n) for n, c in extra_agg.items()])
            b = b.crossJoin(F.broadcast(ex))
    else:
        bounds = df.agg(
            F.min(bucket_col).alias("_rk_lo"),
            F.max(bucket_col).alias("_rk_hi"),
            *[c.alias(n) for n, c in (extra_agg or {}).items()],
        )
        b = df.crossJoin(F.broadcast(bounds)).withColumn(
            "_rk_bkt",
            F.expr(
                f"CAST(({bucket_col} - _rk_lo)"
                f" DIV ((_rk_hi - _rk_lo) DIV {int(n_buckets)} + 1) AS INT)"
            ),
        ).drop("_rk_lo", "_rk_hi")
    aggs = [F.count(F.lit(1)).cast("long").alias("_rk_n")]
    aggs += [F.sum(c).cast("long").alias(f"_rk_t_{c}") for c in sum_cols]
    aggs += [F.max(c).alias(f"_rk_m_{c}") for c in mset]
    tot = b.groupBy("_rk_bkt").agg(*aggs)
    prev = tot.select(
        F.col("_rk_bkt").alias("_rk_b2"),
        "_rk_n",
        *[f"_rk_t_{c}" for c in sum_cols],
        *[f"_rk_m_{c}" for c in mset],
    )
    off = (
        tot.select("_rk_bkt")
        .join(prev, F.col("_rk_b2") < F.col("_rk_bkt"), "left")
        .groupBy("_rk_bkt")
        .agg(
            F.coalesce(F.sum("_rk_n"), F.lit(0)).alias("_rk_off_n"),
            *[
                F.coalesce(F.sum(f"_rk_t_{c}"), F.lit(0)).alias(f"_rk_off_{c}")
                for c in sum_cols
            ],
            # prefix max over earlier buckets: stays NULL for the first
            # bucket (no coalesce — the domain may include any value)
            *[
                F.max(f"_rk_m_{c}").alias(f"_rk_offm_{c}")
                for c in mset
            ],
        )
    )
    out = b.join(F.broadcast(off), "_rk_bkt")
    w = Window.partitionBy("_rk_bkt").orderBy(*order_cols)
    if pos_col is not None:
        out = out.withColumn(
            pos_col,
            (F.col("_rk_off_n") + F.row_number().over(w)).cast("long"),
        )
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"_rk_off_{c}") + F.sum(c).over(ws)
        )
    # greatest() skips NULLs, so a NULL bucket offset (first bucket) or a
    # NULL exclusive within-bucket max (first row of a bucket) defers to
    # the other side; both NULL -> NULL (global first row, exclusive)
    for c in max_cols:
        out = out.withColumn(
            f"cummax_{c}",
            F.greatest(F.col(f"_rk_offm_{c}"), F.max(c).over(ws)),
        )
    for c in max_cols_excl:
        out = out.withColumn(
            f"cummaxx_{c}",
            F.greatest(F.col(f"_rk_offm_{c}"), F.max(c).over(wx)),
        )
    return out.drop(
        "_rk_bkt",
        "_rk_off_n",
        *[f"_rk_off_{c}" for c in sum_cols],
        *[f"_rk_offm_{c}" for c in mset],
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket_col: str,
    tiles: int,
    out: str = "bucket",
    n_buckets: int = 64,
    domain: tuple[int, int] | None = None,
    total: int | None = None,
) -> DataFrame:
    """Exact standard-SQL ntile(tiles) over a global order, computed
    distributed: global position via distributed_prefix, bucket via the
    integer ntile arithmetic. Bit-identical to a single-partition
    ntile() window, with no partition-less WindowExec in the plan. The
    total count rides the bounds pass (extra_agg), saving one full
    input evaluation (3 passes: stats, bucket totals, window) — it
    matters when the order key is an expensive expression
    (Morton/Hilbert codes). Callers that already hold BOTH the key
    domain and the row count (e.g. from a stats pass they ran anyway)
    pass domain= AND total= and the stats scan disappears entirely —
    2 input evaluations, the map-side bucket totals and the final
    bucket-partitioned window."""
    if total is not None and domain is None:
        raise ValueError(
            "distributed_ntile: total= requires domain= (without the"
            " domain the bounds pass runs anyway and the caller-supplied"
            " count would merely shadow the one it already computes)"
        )
    ranked = distributed_prefix(
        df,
        order_cols,
        bucket_col,
        pos_col="_rk_pos",
        n_buckets=n_buckets,
        extra_agg=None if total is not None else {
            "_rk_n_tot": F.count(F.lit(1)).cast("long")
        },
        domain=domain,
    )
    n_expr = str(int(total)) if total is not None else "_rk_n_tot"
    return ranked.withColumn(
        out, F.expr(ntile_from_pos_sql("_rk_pos", n_expr, tiles))
    ).drop("_rk_pos", *([] if total is not None else ["_rk_n_tot"]))


def ntile_from_pos_sql(pos: str, n: str, tiles: int) -> str:
    """SQL text computing ``ntile(tiles)`` from a 1-based global position
    ``pos`` and total count ``n`` — the exact standard-SQL bucketing
    (first n%tiles buckets get one extra row). Integer-only; lazy CASE
    keeps the else-branch division safe when n < tiles."""
    k = f"({n} DIV {tiles})"
    r = f"({n} % {tiles})"
    big = f"({k} + 1)"
    return (
        f"CAST(CASE WHEN {pos} <= {r} * {big}"
        f" THEN ({pos} + {big} - 1) DIV {big}"
        f" ELSE {r} + (({pos} - {r} * {big}) + {k} - 1) DIV {k}"
        f" END AS INT)"
    )
