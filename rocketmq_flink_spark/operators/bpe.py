"""Distributed BPE tokenizer training — the iterative merge loop.

Classic byte-pair-encoding training (Sennrich et al.): start from the
character segmentation of every word, repeatedly (1) count adjacent
symbol pairs across the corpus, (2) pick the most frequent pair,
(3) merge it greedily left-to-right in every word. `bpe_merge_candidates`
in the catalog is one step of (1); this module runs the whole loop.

Scale design (what makes this a 100 TB trainer, not a toy):
- The corpus collapses to the DISTINCT-WORD table (word, count) in one
  map-side-combined pass — every later iteration touches only the
  vocabulary, which is orders of magnitude smaller than the token
  stream (the standard BPE-trainer restructuring).
- Per iteration: one vocab-bounded pair-count aggregation (map-side
  combined, weighted by word count) + a TakeOrdered(1) for the argmax.
  The ONLY driver synchronization is collecting that single winning
  row per step (scalar-only, like connected_components' fixpoint sums).
- Merge application is a Catalyst higher-order `aggregate` fold over
  each word's symbol array — greedy left-to-right, non-overlapping,
  whole-stage-codegen'd, no Python in the row path.
- The vocab DataFrame is cached per step and the previous step's cache
  released, so lineage stays shallow and each iteration reads a
  materialized vocab, not a re-derivation from the raw corpus.

Greedy-merge equivalence note: applying merge (a, b) left-to-right with
a fold (append symbol; if the accumulated tail is exactly `a` and the
incoming symbol is `b`, replace the tail with `ab`) equals the
"islands" formulation the DuckDB oracle replays (candidate positions
grouped into runs; the 1st, 3rd, 5th... of each run merge) — for a != b
candidates are never adjacent so every candidate merges; for a == b the
parity rule reproduces exactly the fold's consume-then-skip behavior
("aaaa" -> [aa, aa], "aaa" -> [aa, a]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c): distinct normalized words with corpus occurrence counts."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    return (
        df.select(
            F.explode(
                F.split(F.expr(normalize_sql(text_col)), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _char_split(col: str) -> Column:
    return F.expr(
        f"CASE WHEN length({col}) >= 1 THEN"
        f" transform(sequence(1, length({col})),"
        f" i -> substring({col}, i, 1))"
        f" ELSE array() END"
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word count — map-side
    combined; rows are O(distinct pairs), not O(corpus tokens)."""
    return (
        vocab.select(
            "c",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN"
                    " transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS s1, syms[i+1] AS s2))"
                    " ELSE array() END"
                )
            ).alias("p"),
        )
        .groupBy("p.s1", "p.s2")
        .agg(F.sum("c").cast("long").alias("n"))
    )


def _apply_merge(syms: Column, s1: str, s2: str) -> Column:
    """Greedy left-to-right merge of (s1, s2) -> s1||s2 via a codegen'd
    array fold."""
    a, b, ab = F.lit(s1), F.lit(s2), F.lit(s1 + s2)

    def step(acc: Column, x: Column) -> Column:
        tail_merges = (
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b)
        )
        return F.when(
            tail_merges,
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


MERGES_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def train_bpe(
    df: DataFrame, text_col: str = "text", steps: int = 6
) -> tuple[DataFrame, DataFrame]:
    """Run `steps` BPE merge iterations over the corpus.

    Returns (merges, vocab): merges = one row per learned merge
    (step, lhs, rhs, pair_count) in training order; vocab = the final
    (w, c, syms) segmentation of every distinct word under the learned
    merges. Ties on pair count break lexicographically on (lhs, rhs) —
    deterministic and replayed exactly by the SQL oracle."""
    spark = df.sparkSession
    vocab = (
        word_counts(df, text_col)
        .select("w", "c", _char_split("w").alias("syms"))
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, steps + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), "s1", "s2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        s1, s2, n = best[0]["s1"], best[0]["s2"], int(best[0]["n"])
        merges.append((step, s1, s2, n))
        # localCheckpoint (eager) materializes the step AND truncates
        # lineage: without it the final vocab is a 6-deep nest of
        # higher-order aggregate folds, which Catalyst re-analyzes
        # catastrophically slowly if anything downstream recomputes it
        # (measured: 18 s vs ~1 s for the corpus-segmentation report).
        nxt = vocab.select(
            "w", "c", _apply_merge(F.col("syms"), s1, s2).alias("syms")
        ).localCheckpoint(eager=False)
        if step == 1:
            vocab.unpersist()  # release the char-split cache (v0)
        # checkpointed intermediates are vocab-bounded and released by
        # the session's block manager GC; explicitly unpersisting a
        # lazily-checkpointed frame would race its materialization
        vocab = nxt
    return spark.createDataFrame(merges, MERGES_SCHEMA), vocab
