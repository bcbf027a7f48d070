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
of a few joins per round over two materialized leaves: every iterative
operator here cuts lineage ONCE at loop entry (operators/lineage.cut —
the r08 scheme; without it round t's plan nests round t-1's, so
analysis and per-action physical planning grow ~2^rounds). See
operators/lineage.py for the multi-node fault-tolerance knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.lineage import cut

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
    teleport-only formulation. NOTE the node set is derived from the
    out-degree keys: a contract-violating node with only in-edges is
    ABSENT from the output (it would otherwise appear with teleport +
    incoming mass) — silent on violation, by design of the contract."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # contract: every node has out-degree >= 1, so the node set IS the
    # out-degree aggregation's key set — deriving it there removes a
    # union + distinct exchange over 2|E| rows (the deg exchange is
    # reused by Catalyst for both consumers)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"))
    ed = e.join(deg, "src")
    # every iteration's plan nests the previous one, so action-time
    # physical planning re-walks the edge pipeline once per iteration;
    # cutting the lineage at loop entry makes each round's plan a few
    # nodes over two leaves (optimization r08 — measured the dominant
    # per-run cost on the co-purchase graph family)
    ed = cut(ed, big=True)
    nodes = cut(nodes, big=True)
    scores = nodes.select("node", F.lit(scale).cast("long").alias("score"))
    base = (15 * scale) // 100
    for i in range(iters):
        if i == 0:
            # uniform init: contrib = scale div deg per edge — the
            # first edges x scores join is an identity lookup, skip it
            inc = (
                ed.select(
                    "dst",
                    F.expr(f"CAST({scale} AS BIGINT) div deg").alias(
                        "contrib"
                    ),
                )
                .groupBy("dst")
                .agg(F.sum("contrib").alias("inc"))
            )
        else:
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
    return scores


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """Personalized PageRank: the teleport mass returns to the SEED set
    instead of spreading uniformly, so scores measure proximity to the
    seeds rather than global centrality — the random-walk relevance
    measure behind graph-based recommendation ("people who bought X
    reach Y in a few steps"). Same exact integer quantization as
    pagerank_integer: all mass starts on the seeds, each round
        score'(v) = [v in seeds] * (15 * scale div 100)
                    + (85 * sum_in(v)) div 100,
    every division floored in BIGINT — bit-deterministic and
    SQL-replayable. Same scale shape per iteration as pagerank_integer
    (one edges x scores hash join, one map-side-combinable groupBy,
    one node-sized left join); no driver sync. Same node-set contract
    and caveat as pagerank_integer: nodes without out-edges are absent
    from the output."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # same contract as pagerank_integer (every node has out-degree
    # >= 1): the node set is deg's key set — no union+distinct pass
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"))
    ed = e.join(deg, "src")
    sd = seeds.select(F.col(seed_col).alias("node")).distinct().withColumn(
        "is_seed", F.lit(1)
    )
    nodes = nodes.join(sd, "node", "left").select(
        "node", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed")
    )
    # same loop-entry lineage cut as pagerank_integer (optimization r08)
    ed = cut(ed, big=True)
    nodes = cut(nodes, big=True)
    scores = nodes.select(
        "node", (F.col("is_seed") * scale).cast("long").alias("score")
    )
    base = (15 * scale) // 100
    for _ in range(iters):
        # zero-score nodes contribute floor(0/deg) = 0 to every
        # neighbor: dropping them pre-join only turns explicit
        # sum-of-zeros into an absent group, and the coalesce(inc, 0)
        # below restores the same score — with a sparse seed set this
        # keeps the first iterations' join frontier-sized
        nz = scores.where(F.col("score") > 0)
        inc = (
            ed.join(nz, ed["src"] == nz["node"])
            .select("dst", F.expr("score div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        scores = nodes.join(
            inc, nodes["node"] == inc["dst"], "left"
        ).select(
            "node",
            (
                F.col("is_seed") * F.lit(base)
                + F.expr("(85 * coalesce(inc, 0L)) div 100")
            ).cast("long").alias("score"),
        )
    return scores


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
    with_degree: bool = False,
) -> DataFrame:
    """Exact per-node triangle counts over an undirected simple graph
    (input: one row per edge in either/both directions; deduped here).

    Degree-ordered orientation [Schank & Wagner / Cohen's MapReduce
    formulation]: orient every edge from the LOWER (degree, id) node
    to the higher, then count wedges u->v, u->w (u the smallest in
    that order) closed by an oriented edge v->w. Every triangle is
    counted exactly once, and — the scale property — the wedge join
    fans out on ORIENTED out-degree, which the orientation bounds by
    O(sqrt(m)) for ANY degree distribution: a celebrity node with
    10^6 neighbors contributes wedges only through its (few)
    higher-ordered neighbors, so total wedge volume is O(m^1.5), not
    sum(deg^2). Returns (node, n_triangles) for every node with at
    least one edge (0 rows cost nothing); the caller aggregates the
    global count as sum/3 if needed.

    assume_canonical: the caller guarantees the input is already one
    UNIQUE row per undirected edge with src < dst (true for the
    co-purchase support pairs, which come out of a groupBy(p1, p2)
    with p1 < p2 by construction) — skips the least/greatest+distinct
    canonicalization pass, removing a full exchange of the edge list.
    The guarantee is TRUSTED: duplicate rows or a >= b rows silently
    inflate degrees and triangle counts — only set it when the
    producing plan enforces uniqueness and a < b structurally.
    with_degree: also emit the (canonical-edge) `degree` column the
    orientation step computes anyway, so callers that need degree
    don't rebuild the same aggregation and join it back on.
    """
    if assume_canonical:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
    # e appears three times below (both degree branches + the
    # orientation join): cut its lineage once (optimization r08)
    e = cut(e, big=True)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orientation key: (degree, id) total order
    da = deg.select(
        F.col("n").alias("a"), F.col("d").alias("da")
    )
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .alias("o")
        )
        .select("o.u", "o.v")
    )
    # three consumers (both wedge sides + the closer probe) re-plan the
    # oriented pipeline per action without this cut (optimization r08)
    oriented = cut(oriented, big=True)
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    # close the wedge with an oriented edge x->y OR y->x (orientation
    # between x and y depends on their degrees, so test the pair)
    closer = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(
        closer, ["x", "y"]
    ).select(F.col("u"), F.col("x"), F.col("y"))
    per_node = (
        tri.select(F.col("u").alias("n"))
        .unionAll(tri.select(F.col("x").alias("n")))
        .unionAll(tri.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out_cols = [
        deg["n"].alias("node"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    ]
    if with_degree:
        out_cols.append(deg["d"].alias("degree"))
    return deg.join(per_node, deg["n"] == per_node["n"], "left").select(
        *out_cols
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own label; each round every node adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label — fully deterministic, unlike the classic randomized LPA.
    Input is an undirected graph (either/both edge directions; deduped
    and symmetrized here). Returns (node, community) after `iters`
    synchronous rounds.

    Complements the rest of the graph family: connected components
    answers reachability, PageRank centrality, triangles local
    density; LPA splits a connected component into dense communities.

    Scale shape per round: one hash join edges x labels on src (labels
    node-sized), one map-side-combinable (dst, label) count, one
    deterministic argmax agg per dst — the same join volume as a
    PageRank step; no driver synchronization (fixed round count)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    e = (
        und.select("a", "b")
        .unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    # loop-entry lineage cut (optimization r08 — see pagerank_integer)
    e = cut(e, big=True)
    labels = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").cast("long").alias("lab")
    )
    for it in range(iters):
        if it == 0:
            # initial label of a node is the node itself, so the first
            # edges x labels join is an identity lookup: project the
            # label straight off the edge list (skips the join AND the
            # distinct-nodes exchange feeding it)
            nb = (
                e.select(F.col("b"), F.col("a").cast("long").alias("lab"))
                .groupBy("b", "lab")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        else:
            nb = (
                e.join(labels, e["a"] == labels["node"])
                .select(F.col("b"), F.col("lab"))
                .groupBy("b", "lab")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        # argmax by (count desc, label asc): max of (c, -lab)
        labels = (
            nb.groupBy("b")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lab")).alias("nl"))
                ).alias("m")
            )
            .select(
                F.col("b").alias("node"),
                (-F.col("m.nl")).cast("long").alias("lab"),
            )
        )
    return labels.select("node", F.col("lab").alias("community"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: exact shortest hop distance from the seed set,
    up to `max_hops`. Input is an undirected graph (symmetrized here);
    returns (node, dist) for every node reached within the horizon —
    unreached nodes are absent (at 100 TB materializing "infinity" rows
    for the whole node set would dwarf the frontier).

    Scale shape per level: one hash join edges x known-distances on
    src, then a min-combine groupBy — level-synchronous BFS, the
    standard distributed formulation; no driver sync (fixed horizon).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    e = (
        und.select("a", "b")
        .unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    # the state ∪ step loop duplicates the edge subplan ~2^max_hops
    # times in the analyzed plan; one lineage cut keeps planning linear
    # (optimization r08 — see sssp_bounded)
    e = cut(e, big=True)
    dist = cut(seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("int").alias("dist")
    ).distinct())
    for t in range(1, max_hops + 1):
        step = (
            e.join(dist, e["a"] == dist["node"])
            .select(F.col("b").alias("node"), F.lit(t).cast("int").alias("dist"))
        )
        dist = (
            dist.unionAll(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
    rounds: int = 4,
) -> DataFrame:
    """Bounded Bellman-Ford: exact weighted shortest-path distance from
    the seed set over paths of at most `rounds` edges. Weights must be
    non-negative integers (quantized ticks — keep every distance sum
    in the integer domain so the min-combine is bit-deterministic
    under any partitioning and replayable by a SQL oracle). Input is a
    directed weighted edge list (symmetrize before calling for an
    undirected graph); returns (node, dist) for every node reached
    within the horizon — unreached nodes are absent, as in bfs_hops.

    The bounded formulation is well-defined regardless of convergence:
    dist_K(v) = min over paths with <= K edges — an engine-independent
    quantity even when the full shortest path needs more hops. Scale
    shape per round: one hash join edges x known-distances on src +
    one min-combine groupBy — the weighted generalization of the BFS
    level step; relaxed-state size is bounded by reached nodes, and
    there is no driver synchronization (fixed round count)."""
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"),
        F.col(weight).cast("long").alias("w"),
    )
    # dist_t's plan contains dist_{t-1} twice (state ∪ step), so the
    # edge subplan is duplicated ~2^rounds times by the horizon — with
    # a deep edge pipeline (the co-purchase kernel) Catalyst analysis
    # and per-action physical planning pay that factor. One lineage
    # cut turns the duplicated subplan into a leaf (optimization r08).
    e = cut(e, big=True)
    dist = cut(seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct())
    for _ in range(rounds):
        step = e.join(dist, e["a"] == dist["node"]).select(
            F.col("b").alias("node"),
            (F.col("dist") + F.col("w")).cast("long").alias("dist"),
        )
        dist = (
            dist.unionAll(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def bfs_hops_per_seed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Per-seed multi-source BFS: exact shortest hop distance from
    EACH seed separately — (seed, node, dist) rows, the input to
    distance-weighted centralities (harmonic/closeness) where the
    min-over-seeds of bfs_hops would collapse exactly the information
    needed. Same level-synchronous shape with the seed id carried
    through the frontier: one edges-x-frontier hash join + a
    (seed, node) min-combine per level; state is |seeds| x frontier —
    keep the seed set small (centrality probes), it multiplies every
    level's join output."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    e = (
        und.select("a", "b")
        .unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    # same lineage cut as bfs_hops/sssp_bounded (optimization r08)
    e = cut(e, big=True)
    dist = cut(seeds.select(
        F.col(seed_col).alias("seed"),
        F.col(seed_col).alias("node"),
        F.lit(0).cast("int").alias("dist"),
    ).distinct())
    for t in range(1, max_hops + 1):
        step = e.join(dist, e["a"] == dist["node"]).select(
            "seed",
            F.col("b").alias("node"),
            F.lit(t).cast("int").alias("dist"),
        )
        dist = (
            dist.unionAll(step)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist
