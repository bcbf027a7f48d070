"""Fuzzy matching via SymSpell deletion-neighborhood blocking.

Entity-resolution / record-linkage candidate generation: find all pairs
of strings within Levenshtein distance 1 WITHOUT an O(n^2) cross join.
Two strings are within edit distance 1 iff they share a member of each
other's 1-deletion neighborhood (Garbe's SymSpell observation):

  - insertion/deletion pairs (len diff 1): the shorter string IS one of
    the longer string's deletions;
  - substitution pairs (same len): deleting the differing position from
    both yields the same string.

So generating {s} ∪ {s minus char i} per string and equi-joining on the
variant finds every candidate; a shared variant can also link
transposition-style pairs at distance 2 ("ab"/"ba" share "a"), so each
candidate is verified with the exact levenshtein before emission.

Scale design: the variant table is O(rows x avg_len) — generated
map-side, joined on the variant string (hashable key, even buckets for
ID-like keys), candidate pairs deduplicated BEFORE the levenshtein
verify. Never materializes the cross product. For edit distance d,
generate depth-d deletion neighborhoods (size ~len^d) — practical for
d <= 2; this module implements d = 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETION_VARIANTS_SQL_TAIL = (
    "transform(sequence(1, length({col})),"
    " i -> concat(substring({col}, 1, i-1),"
    " substring({col}, i+1, length({col}))))"
)


def edit_distance_pairs(
    df: DataFrame, key_col: str, min_len: int = 0
) -> DataFrame:
    """All unordered pairs of DISTINCT non-null values of key_col
    within Levenshtein distance 1, as (a, b, dist) with a < b. One
    variant explode + one equi-join on the variant + one dedup + exact
    verify — no cross join anywhere in the plan. The empty string
    participates (its identity variant joins any 1-char string's
    deletion variant); pass min_len > 0 to exclude short keys."""
    from rocketmq_flink_spark.session import spread_for_compute

    # spread: the variant explode and the downstream join/verify are
    # CPU-heavy on byte-tiny inputs — a small parquet scans as ONE
    # partition and AQE keeps coalescing it, serializing the whole
    # pipeline on one core (measured 8.3 s at sf0.1 before spreading).
    vals = spread_for_compute(
        df.select(F.col(key_col).alias("s"))
        .where(F.col(key_col).isNotNull() & (F.length("s") >= min_len))
        .distinct()
    )
    # Deletion variants TAGGED with their deletion index. Position
    # tagging makes the blocking near-lossless-precise:
    #   - substitution pairs (same length, differ at p) share exactly
    #     the delete-at-p variant — join on (variant, i);
    #   - indel pairs: the shorter string IS a deletion variant of the
    #     longer — join identity-vs-variants (any i).
    # An untagged self-join also buckets transposition-style distance-2
    # pairs ("ab"/"ba" share "a" — at DIFFERENT indices); on dense key
    # spaces those dominate (sf0.1: 956k candidates, 73% junk). With
    # tags, every candidate is provably at distance exactly 1, and the
    # final levenshtein only guards against 64-bit hash collisions.
    # Joins run on the 8-byte xxhash64 of the variant, never the
    # string: a collision adds a spurious candidate, verified out.
    # ONE self-join: identity rides along as index 0, so indel pairs
    # (identity-vs-deletion, either side) and substitution pairs
    # (same index) come out of the same hash probe; the index rule is
    # a residual integer predicate evaluated before any string work.
    # length-0 guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]),
    # so the empty string must take the identity-only branch.
    var = vals.select(
        "s",
        F.posexplode(
            F.expr(
                "CASE WHEN length(s) = 0 THEN array(s)"
                " ELSE concat(array(s), "
                + DELETION_VARIANTS_SQL_TAIL.format(col="s")
                + ") END"
            )
        ).alias("i", "vr"),
    ).select("s", "i", F.xxhash64("vr").alias("vh"))
    a, b = var.alias("a"), var.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.s") < F.col("b.s"))
            & (
                (F.col("a.i") == F.col("b.i"))
                | (F.col("a.i") == 0)
                | (F.col("b.i") == 0)
            ),
        )
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("a", "b")).where(
        F.col("dist") == 1
    )
