"""Corpus curation end-to-end: the cleanup pass a training-data
pipeline runs between raw ingest and tokenization, built entirely from
this repo's operators —

  1. line-level boilerplate removal (RefinedWeb-style),
  2. asymmetric containment scan (drop docs subsumed in others),
  3. fuzzy key audit (near-colliding entity ids via SymSpell blocking),
  4. BPE tokenizer training on the cleaned corpus + per-source
     fertility (compression) report,
  5. co-purchase graph + integer PageRank (the importance signal a
     curriculum sampler would join against).

Every stage is a pure DataFrame transform with the scale notes living
in the operator modules; nothing here collects data to the driver
beyond the BPE trainer's one scalar row per merge step.

Run: PYTHONPATH=/root/repo python examples/corpus_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str) -> dict:
    from rocketmq_flink_spark.operators.bpe import train_bpe
    from rocketmq_flink_spark.operators.dedup import (
        containment_pairs,
        line_dedup,
    )
    from rocketmq_flink_spark.operators.fuzzy import edit_distance_pairs
    from rocketmq_flink_spark.operators.graph import pagerank_integer
    from rocketmq_flink_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    docs, cust, li = t["documents"], t["customer"], t["lineitem"]
    out: dict = {}

    # 1. line dedup over 10-word pseudo-lines (fixture texts are
    #    single-line; a real corpus splits on '\n')
    lined = docs.select(
        "doc_id", F.split("text", " ").alias("_toks")
    ).select(
        "doc_id",
        F.expr(
            "array_join(transform("
            " sequence(0, greatest(CAST(ceil(size(_toks) / 10.0) AS INT) - 1, 0)),"
            " i -> array_join(slice(_toks, i*10 + 1, 10), ' ')), '\n')"
        ).alias("text"),
    )
    cleaned = line_dedup(lined, "doc_id", "text", min_docs=2)
    out["line_dedup_removed_lines"] = (
        cleaned.agg(F.sum("n_removed")).collect()[0][0]
    )

    # 2. containment: drop documents >= 60% contained in another
    contained = containment_pairs(
        docs, "doc_id", "text", k=5, threshold_pct=60
    ).select("contained").distinct()
    kept = docs.join(contained, docs["doc_id"] == contained["contained"],
                     "left_anti")
    out["docs_kept_after_containment"] = kept.count()

    # 3. fuzzy entity-key audit on customer names
    out["near_colliding_name_pairs"] = edit_distance_pairs(
        cust, "c_name"
    ).count()

    # 4. BPE trainer on the cleaned corpus + fertility by source
    merges, vocab = train_bpe(
        cleaned.select(
            F.col("doc").alias("doc_id"),
            F.col("text_clean").alias("text"),
        ),
        "text",
        steps=6,
    )
    out["bpe_merges"] = [
        (r["lhs"], r["rhs"], r["pair_count"])
        for r in merges.orderBy("step").collect()
    ]
    out["post_bpe_symbols"] = vocab.agg(
        F.sum(F.size("syms") * F.col("c"))
    ).collect()[0][0]

    # 5. importance scores over the co-purchase graph
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    sup = (
        baskets.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(ps) >= 2 THEN"
                    " flatten(transform(sequence(0, size(ps) - 2),"
                    "  i -> transform(sequence(i + 1, size(ps) - 1),"
                    "   j -> struct(ps[i] AS p1, ps[j] AS p2))))"
                    " ELSE array() END"
                )
            ).alias("pr")
        )
        .groupBy("pr.p1", "pr.p2")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
    )
    edges = sup.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(
        sup.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    top = (
        pagerank_integer(edges, iters=3)
        .orderBy(F.desc("score"), "node")
        .limit(3)
        .collect()
    )
    out["top_parts_by_pagerank"] = [(r["node"], r["score"]) for r in top]
    return out


if __name__ == "__main__":
    from rocketmq_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-curation-example")
    for k, v in run(spark, sf_dir).items():
        print(f"{k}: {v}")
