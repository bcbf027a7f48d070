"""Rank fusion for hybrid retrieval: reciprocal rank fusion (RRF).

Combines any number of per-query ranked lists (BM25, dense ANN, ...)
into one ranking: RRF(d) = sum over rankers r of 1 / (K + rank_r(d)),
K = 60 (Cormack, Clarke & Buettcher 2009) — the standard hybrid-search
fusion because it needs no score calibration between rankers, only
ranks.

Exactness design: the reciprocal is scaled to integer ticks,
ticks = SCALE div (K + rank) with SCALE = 1e9 — integer floor division
of positive integers, identical in Spark (`div`) and DuckDB (`//`).
Fused scores are exact BIGINT sums; the final ranking ties break on
doc id. SCALE = 1e9 makes the floor loss < 1 tick in ~1e7 — far below
any meaningful rank-1/rank-2 tick gap (for K = 60: rank 1 vs 2 differ
by ~2.6e5 ticks).

Scale design: fusion is rank-arithmetic on the CANDIDATE lists (k rows
per query per ranker), never the corpus — one union + one
map-side-combinable groupBy on (query, doc), output k-bounded. The
expensive parts (BM25 postings join, ANN probe) stay in their own
operators with their own scale stories.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    ranked: dict[str, DataFrame],
    qid_col: str = "qid",
    doc_col: str = "doc",
    rank_col: str = "rank",
    k_const: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Fuse named ranked lists into (qid, doc, <name>_rank ...,
    rrf_ticks, rank). Each input needs (qid, doc, rank) columns; a doc
    missing from a list contributes nothing for it (its <name>_rank
    reports 0). Output is the per-query top `topk` by fused ticks,
    ties broken on doc id."""
    tagged = [
        df.select(
            F.col(qid_col).alias("qid"),
            F.col(doc_col).alias("doc"),
            F.col(rank_col).cast("long").alias("rnk"),
            F.lit(name).alias("tag"),
        )
        for name, df in ranked.items()
    ]
    u = reduce(DataFrame.unionAll, tagged)
    aggs = [
        F.sum(F.expr(f"{RRF_SCALE} div ({k_const} + rnk)")).alias(
            "rrf_ticks"
        )
    ] + [
        F.max(
            F.when(F.col("tag") == name, F.col("rnk")).otherwise(F.lit(0))
        ).alias(f"{name}_rank")
        for name in ranked
    ]
    fused = u.groupBy("qid", "doc").agg(*aggs)
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_ticks"), "doc")
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )
