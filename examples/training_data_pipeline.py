"""End-to-end training-data pipeline on the fixture corpus: the full
chain a 100 TB ingest would run, composed from this repo's operators —
profile -> quality filter -> decontaminate -> dedup -> chunk/pack ->
mixture-weighted sample. Every stage is a pure DataFrame transform; the
same code runs on a 1000-executor cluster by changing only the input
path.

Run: PYTHONPATH=/root/repo python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str) -> dict:
    from rocketmq_flink_spark.operators.contamination import decontaminate
    from rocketmq_flink_spark.operators.dedup import minhash_dedup
    from rocketmq_flink_spark.operators.pipeline import (
        mixture_weights,
        pack_sequences,
        stratified_sample,
    )
    from rocketmq_flink_spark.operators.text import (
        quality_filter_flags,
        token_count,
    )
    from rocketmq_flink_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    stats = {"0_ingested": docs.count()}

    # 1. quality filter (C4/Gopher rules, first-failing attribution)
    flags = quality_filter_flags(docs, "doc_id", "text")
    docs = docs.join(flags.where("kept").select("doc_id"), "doc_id")
    stats["1_quality_kept"] = docs.count()

    # 2. benchmark decontamination (eval suite stand-in: doc_id % 97)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    docs = decontaminate(
        docs.where(F.col("doc_id") % 97 != 0), bench, "doc_id", "text",
        max_overlap_permille=500,
    )
    stats["2_decontaminated"] = docs.count()

    # 3. near-dup removal: keep each transitive group's representative
    groups = minhash_dedup(docs, "doc_id", "text", threshold=0.7)
    docs = docs.join(
        groups.where(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    stats["3_deduped"] = docs.count()

    # 4. mixture-weighted sampling to half the surviving token budget
    with_tok = docs.withColumn("n_tok", token_count("text"))
    total = with_tok.agg(F.sum("n_tok")).first()[0]
    weights = mixture_weights(
        with_tok, "source", "n_tok",
        budget_tokens=int(total) // 2, default_permille=50,
    )
    rates = {
        r["source"]: int(r["rate_permille"]) for r in weights.collect()
    }
    sampled = stratified_sample(
        with_tok, "doc_id", "source", rates, default_permille=0
    )
    stats["4_sampled"] = sampled.count()

    # 5. pack into fixed-budget training windows per source
    packed = pack_sequences(sampled, "doc_id", "n_tok", "source", 1024)
    stats["5_packs"] = packed.select("source", "pack_id").distinct().count()
    return stats


def main() -> None:
    from rocketmq_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training_data_pipeline")
    for stage, n in run(spark, sf_dir).items():
        print(f"{stage}: {n}")


if __name__ == "__main__":
    main()
