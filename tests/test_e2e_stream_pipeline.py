"""Capstone: the training-data pipeline run INCREMENTALLY over a
document stream converges to the batch pipeline's answer.

Documents arrive in microbatches (file stream, 3 triggers). Each batch
flows through quality filter -> Bloom benchmark decontamination (static
filter, built once) -> incremental exact dedup against the accumulated
corpus; running HLL vocabulary registers are merged across batches.
Every stage is order-independent (per-doc predicates; keep-FIRST exact
dedup equals keep-MIN-id when batches arrive in id order), so the final
kept set must equal the one-shot batch pipeline EXACTLY — the property
that lets a 100 TB corpus be built by continuous ingest instead of
periodic full recomputes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.dedup import normalize_sql
from rocketmq_flink_spark.operators.sketches import (
    bloom_build,
    bloom_filter_words,
    hll_registers,
    with_bloom_hit,
)
from rocketmq_flink_spark.operators.text import quality_filter_flags
from rocketmq_flink_spark.session import load_tables

SF = "/root/testdata/sf0.001"
BLOOM_M = 1 << 14


def _grams(df):
    from rocketmq_flink_spark.operators.dedup import exploded_shingles

    return exploded_shingles(df, "doc_id", "text", k=5)


def _clean_batch(batch_df, bloom_words):
    """quality filter + Bloom decontamination for one batch (pure,
    per-doc, order-independent)."""
    kept = batch_df.join(
        quality_filter_flags(batch_df, "doc_id", "text")
        .where("kept")
        .select("doc_id"),
        "doc_id",
    )
    flagged = (
        with_bloom_hit(_grams(kept), "sh", bloom_words, m=BLOOM_M)
        .where("bloom_hit")
        .select(F.col("doc").alias("doc_id"))
        .distinct()
    )
    return kept.join(flagged, "doc_id", "left_anti")


def test_incremental_pipeline_equals_batch(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    # static benchmark Bloom filter, built once (the broadcast-state
    # pattern: a model artifact shared by every microbatch)
    bloom_words = bloom_filter_words(
        bloom_build(
            _grams(bench).select("sh").distinct(), F.col("sh"), m=BLOOM_M
        ),
        m=BLOOM_M,
    )

    # ---- batch reference: one-shot pipeline over the full corpus ----
    cleaned = _clean_batch(corpus, bloom_words)
    batch_kept = cleaned.withColumn(
        "_norm", F.expr(normalize_sql("text"))
    ).groupBy("_norm").agg(F.min("doc_id").alias("doc_id"))
    expect_ids = sorted(r.doc_id for r in batch_kept.collect())

    # ---- incremental: 3 id-ordered microbatches, accumulated state ----
    src = tmp_path / "arrivals"
    n = corpus.count()
    b1 = corpus.orderBy("doc_id").limit(n // 3)
    b2 = corpus.orderBy("doc_id").limit(2 * n // 3).exceptAll(b1)
    b3 = corpus.orderBy("doc_id").exceptAll(b1.unionAll(b2))
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.mode("append").parquet(str(src / f"f{i}"))

    # accumulated dedup index: a (normalized-text-key) TABLE probed with
    # an anti-join — the persisted-index shape a real ingest job uses
    # (at scale: a parquet/Delta table of 8-byte key hashes), never a
    # driver-side set
    index = spark.createDataFrame([], "_norm string")
    kept_ids: list[int] = []
    sketch_parts: list[pd.DataFrame] = []

    for i in range(3):
        batch = spark.read.parquet(str(src / f"f{i}"))
        clean = _clean_batch(batch, bloom_words).withColumn(
            "_norm", F.expr(normalize_sql("text"))
        )
        # keep-first within the batch (min doc_id per key), then drop
        # keys already in the accumulated index
        first = clean.groupBy("_norm").agg(F.min("doc_id").alias("doc_id"))
        new_rows = first.join(index, "_norm", "left_anti")
        kept_ids += [r.doc_id for r in new_rows.select("doc_id").collect()]
        index = index.unionAll(new_rows.select("_norm")).localCheckpoint(
            eager=True
        )
        # running vocabulary sketch: registers per batch, merged by max
        sketch_parts.append(
            hll_registers(
                clean.select(
                    F.explode(F.split(F.col("_norm"), r"\s+")).alias("tok")
                ).where("tok <> ''"),
                F.col("tok"),
                [],
            ).toPandas()
        )

    assert sorted(kept_ids) == expect_ids

    # merged streaming sketch == batch sketch over the cleaned corpus
    merged = (
        pd.concat(sketch_parts, ignore_index=True)
        .groupby("bucket", as_index=False)["m"]
        .max()
    )
    batch_reg = (
        hll_registers(
            cleaned.select(
                F.explode(
                    F.split(F.expr(normalize_sql("text")), r"\s+")
                ).alias("tok")
            ).where("tok <> ''"),
            F.col("tok"),
            [],
        )
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    merged = merged.sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged[["bucket", "m"]], batch_reg[["bucket", "m"]], check_dtype=False
    )
