"""Unit tests for the round-4 additions: deterministic label
propagation, multi-source BFS, reciprocal-rank fusion, and the
fixed-point Naive Bayes classifier (vs a pure-Python witness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.classify import (
    nb_model_ticks,
    nb_predict,
    nb_train,
)
from rocketmq_flink_spark.operators.fusion import rrf_fuse
from rocketmq_flink_spark.operators.graph import bfs_hops, label_propagation
from rocketmq_flink_spark.operators.retrieval import fp_log2_py


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_label_propagation_two_cliques(spark):
    # two 4-cliques bridged by a single edge: LPA must separate them
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    out = label_propagation(
        _edges(spark, c1 + c2 + [(3, 10)]), iters=4
    ).collect()
    comm = {r.node: r.community for r in out}
    assert len(set(comm[n] for n in range(4))) == 1
    assert len(set(comm[n] for n in range(10, 14))) == 1
    assert comm[0] != comm[11]
    # smallest-label tie-break makes the community ids the clique minima
    assert comm[1] == 0 and comm[11] == 10


def test_label_propagation_deterministic_under_repartition(spark):
    pairs = [(a, b) for a in range(6) for b in range(6) if a < b][:9]
    e = _edges(spark, pairs)
    r1 = sorted(map(tuple, label_propagation(e, iters=3).collect()))
    r2 = sorted(
        map(tuple, label_propagation(e.repartition(7), iters=3).collect())
    )
    assert r1 == r2


def test_bfs_hops_path_graph(spark):
    # path 0-1-2-3-4-5, seed {0}: dist = node index, horizon cuts at 3
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    seeds = e.select(F.lit(0).cast("long").alias("node")).limit(1)
    out = {r.node: r.dist for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond horizon: absent


def test_bfs_multi_source_takes_min(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(0,), (4,)], "node LONG")
    out = {r.node: r.dist for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_rrf_fuse_hand_computed(spark):
    bm = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "qid LONG, doc LONG, rank INT"
    )
    dn = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "qid LONG, doc LONG, rank INT"
    )
    out = {
        r.doc: (r.rrf_ticks, r.bm25_rank, r.dense_rank, r.rank)
        for r in rrf_fuse({"bm25": bm, "dense": dn}, topk=10).collect()
    }
    s = 1_000_000_000
    assert out[11] == (s // 62 + s // 61, 2, 1, 1)  # in both lists: wins
    assert out[10] == (s // 61, 1, 0, 2)
    assert out[13] == (s // 62, 0, 2, 3)
    assert out[12] == (s // 63, 3, 0, 4)


def test_nb_matches_python_witness(spark):
    # tiny 2-class corpus over 8 buckets; python witness replays the
    # identical fixed-point arithmetic
    B = 8
    rows = [  # (doc, class, bucket)
        (0, "a", 0), (0, "a", 0), (0, "a", 1),
        (1, "a", 0), (1, "a", 2),
        (2, "b", 3), (2, "b", 3), (2, "b", 4),
        (3, "b", 3), (3, "b", 5),
    ]
    test_rows = [(10, 0), (10, 1), (11, 3), (11, 4), (12, 0), (12, 3)]
    trn = spark.createDataFrame(rows, "doc_id LONG, source STRING, b INT")
    tst = spark.createDataFrame(test_rows, "doc_id LONG, b INT")
    counts, priors = nb_train(trn, B)
    model = nb_model_ticks(counts, tst, B)
    got = {
        r.doc: r.predicted
        for r in nb_predict(tst, model, priors).collect()
    }

    # python witness
    from collections import Counter

    cnt = Counter((c, b) for _, c, b in rows)
    tot = Counter()
    for (c, _), n in cnt.items():
        tot[c] += n
    ndc = {"a": 2, "b": 2}
    nd = 4
    prior = {c: -fp_log2_py(nd, ndc[c]) for c in ndc}

    def ticks(c, b):
        return -fp_log2_py(tot[c] + B, cnt.get((c, b), 0) + 1)

    want = {}
    from itertools import groupby

    for doc, grp in groupby(sorted(test_rows), key=lambda r: r[0]):
        bs = [b for _, b in grp]
        scores = {
            c: prior[c] + sum(ticks(c, b) for b in bs) for c in ndc
        }
        want[doc] = min(scores, key=lambda c: (-scores[c], c))
    assert got == want
    assert got[10] == "a" and got[11] == "b"  # sanity: separable docs


def test_bfs_per_seed_matches_single_seed_runs(spark):
    """bfs_hops_per_seed == one bfs_hops per seed, stacked."""
    from rocketmq_flink_spark.operators.graph import (
        bfs_hops,
        bfs_hops_per_seed,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (1, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        (r.seed, r.node): r.dist
        for r in bfs_hops_per_seed(edges, seeds, max_hops=3).collect()
    }
    for s in (1, 4):
        one = spark.createDataFrame([(s,)], "node long")
        want = {
            (s, r.node): r.dist
            for r in bfs_hops(edges, one, max_hops=3).collect()
        }
        assert {k: v for k, v in got.items() if k[0] == s} == want


def test_mmr_select_prefers_diversity_over_pure_relevance(spark):
    """With two tight clusters near the query, MMR must not return
    only the nearest cluster: rank 2 comes from the second cluster
    even though cluster-1 members are closer to the query."""
    from rocketmq_flink_spark.operators.similarity import mmr_select

    rows = []
    # cluster A hugs the query at distance ~0.01; cluster B sits at 0.2
    for i, x in enumerate((0.010, 0.011, 0.012, 0.013)):
        rows.append((i, [x, 0.0]))
    for i, x in enumerate((0.200, 0.201, 0.202)):
        rows.append((10 + i, [x, 0.0]))
    # the hash-seeded query vector is one of the rows; whichever it is,
    # the selected set must span BOTH clusters within the first 3 picks
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_select(df, k=3, pool=6).collect()
    picked = [r.vec_id for r in got]
    assert len(picked) == 3 and len(set(picked)) == 3
    clusters = {0 if v < 10 else 1 for v in picked}
    assert clusters == {0, 1}
    # rank 1 is the plain nearest neighbor (gain 0 by convention)
    assert got[0].mmr_gain == 0.0


def test_mmr_select_handles_duplicate_vectors(spark):
    """Exact-duplicate embeddings must not crash or repeat ids."""
    from rocketmq_flink_spark.operators.similarity import mmr_select

    rows = [(i, [0.5, 0.5]) for i in range(4)] + [
        (10, [0.1, 0.9]), (11, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_select(df, k=4, pool=6).collect()
    ids = [r.vec_id for r in got]
    assert len(ids) == len(set(ids)) == 4


def test_facility_location_gains_nonincreasing_and_distinct(spark):
    """Greedy facility-location: marginal gains must be non-increasing
    (submodularity) and picks distinct; rank-1 pick is the candidate
    with the largest total clamped similarity."""
    from rocketmq_flink_spark.operators.similarity import (
        facility_location_select,
    )

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
        (3, [0.1, 0.9]), (4, [0.5, 0.5]), (5, [0.7, 0.3]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = facility_location_select(df, k=3, pool=6).collect()
    ids = [r.vec_id for r in got]
    gains = [r.coverage_gain for r in got]
    assert len(set(ids)) == 3
    assert all(gains[i] >= gains[i + 1] for i in range(len(gains) - 1))
    assert all(g >= 0 for g in gains)


def test_sssp_bounded_weighted_beats_hops(spark):
    # 0-1-2 cheap chain (1+1) vs direct 0-2 expensive edge (5):
    # hop count prefers 0-2, weighted distance must prefer the chain.
    from rocketmq_flink_spark.operators.graph import sssp_bounded

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (1, 2, 1), (2, 1, 1), (0, 2, 5), (2, 0, 5)],
        "src LONG, dst LONG, w LONG",
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    out = {r.node: r.dist for r in sssp_bounded(e, seeds, rounds=4).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_sssp_bounded_horizon_is_path_length(spark):
    # rounds=1 can only relax one edge: the 2-edge cheap path is not
    # yet visible, the direct expensive edge is the round-1 optimum.
    from rocketmq_flink_spark.operators.graph import sssp_bounded

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 5)], "src LONG, dst LONG, w LONG"
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    out = {r.node: r.dist for r in sssp_bounded(e, seeds, rounds=1).collect()}
    assert out == {0: 0, 1: 1, 2: 5}
    out2 = {r.node: r.dist for r in sssp_bounded(e, seeds, rounds=2).collect()}
    assert out2 == {0: 0, 1: 1, 2: 2}


def test_sssp_deterministic_under_repartition(spark):
    from rocketmq_flink_spark.operators.graph import sssp_bounded

    pairs = [(a, b, (a * 7 + b * 3) % 5 + 1) for a in range(8) for b in range(8) if a != b]
    e = spark.createDataFrame(pairs, "src LONG, dst LONG, w LONG")
    seeds = spark.createDataFrame([(0,)], "node LONG")
    r1 = sorted(map(tuple, sssp_bounded(e, seeds, rounds=3).collect()))
    r2 = sorted(
        map(tuple, sssp_bounded(e.repartition(11), seeds, rounds=3).collect())
    )
    assert r1 == r2


def test_personalized_pagerank_mass_stays_near_seed(spark):
    # barbell: clique {0,1,2} - bridge - clique {10,11,12}; seeding at 0
    # must score the near clique strictly above the far one.
    from rocketmq_flink_spark.operators.graph import personalized_pagerank

    und = [(0, 1), (0, 2), (1, 2), (2, 10), (10, 11), (10, 12), (11, 12)]
    e = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    s = {r.node: r.score for r in personalized_pagerank(e, seeds, iters=3).collect()}
    assert s[0] > 0 and s[1] > 0
    assert min(s[0], s[1], s[2]) > max(s[11], s[12])


def test_personalized_pagerank_deterministic_under_repartition(spark):
    from rocketmq_flink_spark.operators.graph import personalized_pagerank

    und = [(a, b) for a in range(6) for b in range(6) if a < b]
    e = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    r1 = sorted(map(tuple, personalized_pagerank(e, seeds, iters=3).collect()))
    r2 = sorted(
        map(
            tuple,
            personalized_pagerank(e.repartition(9), seeds, iters=3).collect(),
        )
    )
    assert r1 == r2
