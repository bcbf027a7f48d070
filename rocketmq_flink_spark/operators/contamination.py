"""Benchmark decontamination for training-data pipelines.

Not in the reference (it is a connector); part of the north-star
extension surface: before training, every corpus must be checked for
n-gram overlap against evaluation benchmarks (the GPT-3 appendix-C
style 13-gram filter) so test questions don't leak into training data.

Scale design
------------
- Candidate generation is a single equi-join on the n-gram string
  between the corpus's distinct per-doc n-grams and the DISTINCT
  benchmark n-gram set. The benchmark side is an eval suite — tiny
  relative to a 100 TB corpus — so it is broadcast: the corpus is
  scanned once, shuffled zero times for the probe (map-side hash join),
  and only the per-doc counters are aggregated.
- Overlap fractions are reported as exact BIGINT counter pairs
  (n_overlap, n_grams); ratios are computed once at the end — no
  floating-point accumulation, so results are bit-stable at any
  partition count and reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.dedup import exploded_shingles


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap counters.

    Returns (id_col, n_grams, n_overlap): the number of distinct word
    n-grams in the document and how many of them also occur anywhere in
    the benchmark corpus. Normalization (lowercase, strip punctuation,
    collapse whitespace) matches the dedup operators, so a benchmark
    answer that differs only in casing/punctuation still hits.

    A document shorter than n tokens contributes its single short gram
    (same clamping as the dedup shingles) — a deliberate choice so tiny
    benchmark strings can still match tiny documents.
    """
    doc_grams = exploded_shingles(docs, id_col, text_col, k=n)
    bench_grams = (
        exploded_shingles(benchmark, id_col, text_col, k=n)
        .select("sh")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    sizes = doc_grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(bench_grams, "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        sizes.join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_overlap_permille: int = 100,
) -> DataFrame:
    """Drop documents whose benchmark n-gram overlap exceeds the
    threshold (expressed in permille of the document's distinct n-grams
    so the cut is an exact integer comparison, not a float one).

    Returns the surviving document rows unchanged. One broadcast probe
    join + one aggregation; survivors are recovered with a join on the
    id (the corpus text never rides through the counter shuffle).
    """
    counts = ngram_contamination(docs, benchmark, id_col, text_col, n)
    keep = counts.where(
        F.col("n_overlap") * 1000 <= F.lit(max_overlap_permille) * F.col("n_grams")
    ).select(id_col)
    return docs.join(keep, id_col)
