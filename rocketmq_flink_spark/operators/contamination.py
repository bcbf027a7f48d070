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


def fuzzy_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    probe_tokens: int = 16,
    chunk_tokens: int = 16,
    overlap: int = 8,
    n: int = 5,
    max_dist_pct: int = 30,
) -> DataFrame:
    """Edit-distance-VERIFIED benchmark contamination (the fuzzy tier
    above the exact n-gram filter): near-matches that an exact 13-gram
    check misses — paraphrased punctuation, a swapped word, an OCR
    typo — are caught by Levenshtein distance, but Levenshtein against
    a 100 TB corpus is infeasible without blocking, so candidates are
    generated first by shared word n-grams.

    Pipeline: every probe_tokens-token window of every benchmark doc
    is a probe (the whole eval suite is checked, not just prefixes);
    target docs are split into overlapping chunk_tokens-token windows
    (chunk_documents — zero shuffle); a chunk becomes a candidate when
    it shares any word n-gram with a probe (BROADCAST join against the
    benchmark gram set — at real corpus scale the corpus never shuffles
    for the probe; only an under-partitioned small input pays a
    one-time round-robin spread_for_compute exchange so the
    per-chunk DP parallelizes, see the inline comment);
    only candidates pay the Levenshtein DP, and a pair is verified
    when 100 * dist <= max_dist_pct * len(probe).

    Returns (id, chunk_idx, bid, probe_idx, dist, probe_len) — one
    row per verified (target chunk, benchmark probe) pair. All
    arithmetic is exact integers, so the DuckDB oracle reproduces
    every distance bit-for-bit."""
    from rocketmq_flink_spark.operators.dedup import word_shingles
    from rocketmq_flink_spark.operators.pipeline import chunk_documents

    probes = chunk_documents(
        benchmark, id_col, text_col, probe_tokens, probe_tokens // 2
    ).select(
        F.col(id_col).alias("bid"),
        F.col("chunk_idx").alias("probe_idx"),
        F.col("chunk_text").alias("probe_text"),
    )
    probe_grams = probes.select(
        "bid",
        "probe_idx",
        F.explode(
            word_shingles(F.split("probe_text", " "), n)
        ).alias("sh"),
    ).distinct()
    # the chunk/gram explode is the corpus-side CPU stage; spread a
    # small single-row-group scan so it parallelizes (metadata no-op at
    # real corpus scale, where the "never shuffles" property holds —
    # the round-robin only fires on under-partitioned small inputs)
    from rocketmq_flink_spark.session import spread_for_compute

    chunks = chunk_documents(
        spread_for_compute(docs.select(id_col, text_col)),
        id_col, text_col, chunk_tokens, overlap,
    )
    chunk_grams = chunks.select(
        id_col,
        "chunk_idx",
        F.explode(
            word_shingles(F.split("chunk_text", " "), n)
        ).alias("sh"),
    )
    cand = (
        chunk_grams.join(F.broadcast(probe_grams), "sh")
        .select(id_col, "chunk_idx", "bid", "probe_idx")
        .distinct()
    )
    return (
        cand.join(chunks, [id_col, "chunk_idx"])
        .join(F.broadcast(probes), ["bid", "probe_idx"])
        .withColumn("dist", F.levenshtein("chunk_text", "probe_text"))
        .where(
            F.lit(100) * F.col("dist")
            <= F.lit(max_dist_pct) * F.length("probe_text")
        )
        .select(
            id_col,
            "chunk_idx",
            "bid",
            "probe_idx",
            F.col("dist").cast("long").alias("dist"),
            F.length("probe_text").cast("long").alias("probe_len"),
        )
    )
