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

DELETION_VARIANTS_SQL = (
    "array_distinct(concat(array({col}),"
    " transform(sequence(1, length({col})),"
    " i -> concat(substring({col}, 1, i-1),"
    " substring({col}, i+1, length({col}))))))"
)


def edit_distance_pairs(
    df: DataFrame, key_col: str, min_len: int = 1
) -> DataFrame:
    """All unordered pairs of DISTINCT values of key_col within
    Levenshtein distance 1, as (a, b, dist) with a < b. One variant
    explode + one equi-join on the variant + one dedup + exact verify —
    no cross join anywhere in the plan."""
    vals = (
        df.select(F.col(key_col).alias("s"))
        .where(F.length("s") >= min_len)
        .distinct()
    )
    var = vals.select(
        "s",
        F.explode(
            F.expr(DELETION_VARIANTS_SQL.format(col="s"))
        ).alias("vr"),
    )
    a, b = var.alias("a"), var.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vr") == F.col("b.vr"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("a", "b")).where(
        F.col("dist") == 1
    )
