"""Distributed graph algorithms on DataFrames.

connected_components (operators/dedup.py) handles the dedup-closure
case; this module adds quantized PageRank — the importance-ranking
iteration — in EXACT integer arithmetic so results are bit-deterministic
under any partitioning and replayable by a SQL oracle.

Quantized PageRank: scores live in integer micro-units (10^6 = rank
1.0). One iteration is
    contrib(u) = score(u) DIV out_degree(u)          (integer floor)
    score'(v)  = (15 * SCALE) DIV 100
                 + (85 * sum_incoming(v)) DIV 100
i.e. the standard 0.85-damped update with every division floored in the
integer domain. The floor loses < 1 micro-unit per edge per iteration —
irrelevant for ranking — and buys exactness: integer sums are
order-independent, so the scores (not just the order) are reproducible
across runs, partitionings, and engines. Doubles would make every
groupBy sum order-dependent in the last ulp.

Scale shape per iteration: one hash join edges x scores on src (scores
is node-sized, edges the big side), one map-side-combinable groupBy on
dst, one left join back to the node set. No driver synchronization at
all — the iteration count is fixed, so the whole run is one lazy plan
of 3k joins... truncated by per-iteration localCheckpoint when `iters`
is large (default off below 8 iterations, where plain lineage is fine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """Quantized PageRank over a directed edge list. Returns
    (node, score) with score in micro-units. Every node must have
    out-degree >= 1 (feed an undirected graph as both edge
    directions); dangling-node mass is simply dropped, as in the
    teleport-only formulation."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src")
    if iters >= 8:
        ed = ed.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    scores = nodes.select("node", F.lit(scale).cast("long").alias("score"))
    base = (15 * scale) // 100
    for i in range(iters):
        inc = (
            ed.join(scores, ed["src"] == scores["node"])
            .select("dst", F.expr("score div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        scores = nodes.join(
            inc, nodes["node"] == inc["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr("(85 * coalesce(inc, 0L)) div 100")
            ).cast("long").alias("score"),
        )
        if iters >= 8:
            scores = scores.localCheckpoint(eager=False)
    return scores
