"""Corpus monitoring dashboard feed: the always-on observability job a
100 TB training-data pipeline runs beside ingest — cardinality sketches,
heavy-hitter tokens, LM-surprisal quality bins, semantic cluster map,
and contamination alarms, all from this repo's operators. Every stage
is a pure DataFrame transform; register sizes (not data sizes) bound
what crosses stages, so the same job runs on a 1000-executor cluster.

Run: PYTHONPATH=/root/repo python examples/corpus_monitoring.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str) -> dict:
    from rocketmq_flink_spark.operators.contamination import (
        fuzzy_contamination,
    )
    from rocketmq_flink_spark.operators.dedup import normalize_sql
    from rocketmq_flink_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )
    from rocketmq_flink_spark.operators.sketches import (
        countmin_probe,
        countmin_sketch,
        hll_estimate,
        hll_registers,
    )
    from rocketmq_flink_spark.operators.text import bigram_surprisal
    from rocketmq_flink_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    out: dict = {}

    # 1. Vocabulary cardinality per source — HLL registers are m rows per
    #    source regardless of corpus size; a streaming job would merge
    #    them across microbatches by max (see tests/test_streaming.py).
    toks = docs.select(
        "source",
        F.explode(
            F.split(F.expr(normalize_sql("text")), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = hll_estimate(
        hll_registers(toks, F.col("tok"), ["source"]), ["source"]
    )
    out["vocab_est_by_source"] = {
        r.source: r.est_distinct for r in vocab.collect()
    }

    # 2. Heavy-hitter tokens via Count-Min (d*w counters, additive merge).
    sketch = countmin_sketch(toks, "tok")
    top = (
        toks.groupBy("tok").count().orderBy(F.desc("count"), "tok").limit(5)
    )
    probed = countmin_probe(sketch, top, "tok")
    out["top_tokens_cm"] = {
        r.tok: r.cm_est for r in probed.collect()
    }

    # 3. Quality axis: mean quantized bigram surprisal per source (low =
    #    templated/boilerplate, high = rare constructions).
    surp = bigram_surprisal(docs, "doc_id", "text", group_col="source")
    out["surprisal_by_source"] = {
        r.source: r.mean_surprise_q for r in surp.collect()
    }

    # 4. Semantic cluster map: deterministic k-means (IVF trainer), then
    #    cluster sizes — the sampling map a mixture-rebalancer reads.
    cents = ivf_centroids(emb, "vec_id", "embedding", n_centroids=16)
    cells = (
        ivf_assign(emb, cents)
        .groupBy("_centroid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out["cluster_sizes"] = {
        r._centroid: r.n for r in cells.collect()
    }

    # 5. Contamination alarm: fuzzy (edit-distance-verified) matches of
    #    a held-out benchmark slice against the rest of the corpus.
    bench = docs.where(F.col("doc_id") % 11 == 0)
    targets = docs.where(F.col("doc_id") % 11 != 0)
    hits = fuzzy_contamination(targets, bench, "doc_id", "text")
    out["fuzzy_contaminated_docs"] = (
        hits.select("doc_id").distinct().count()
    )

    # 6. Distribution drift alarm: exact total-variation distance between
    #    the doc-id-parity halves' token distributions (yesterday vs
    #    today stand-in) — cross-multiplied BIGINTs, one final division.
    from rocketmq_flink_spark.plans.catalog import REGISTRY

    tv = REGISTRY["token_drift_report"].fn(spark, sf_dir).first()["tv_dist"]
    out["token_drift_tv"] = round(float(tv), 6)

    # 7. Value-distribution watch: mergeable histogram quantiles of
    #    document lengths (256 bins; a stream merges them by bin sum).
    from rocketmq_flink_spark.operators.sketches import (
        hist_bins,
        hist_quantiles,
    )

    base = docs.select(
        F.lit("all").alias("g"),
        F.col("n_chars").cast("double").alias("v"),
        F.lit(0.0).alias("lo"),
        F.lit(20000.0).alias("hi"),
    )
    hq = hist_quantiles(
        hist_bins(base, F.col("v"), ["g", "lo", "hi"], F.col("lo"), F.col("hi")),
        ["g", "lo", "hi"],
        F.col("lo"),
        F.col("hi"),
    ).first()
    out["doc_len_quantiles"] = {
        q: hq[f"{q}_est"] for q in ("p50", "p95", "p99")
    }
    return out


def main() -> None:
    from rocketmq_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_monitoring")
    report = run(spark, sf_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
