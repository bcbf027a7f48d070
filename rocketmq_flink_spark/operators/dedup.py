"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (it is a connector); required by the north-star
extension (BASELINE.json: dedup / similarity / multimodal / text
analysis at 100 TB scale). All operators are pure DataFrame
compositions — no collect(), no driver state, shuffle behavior noted
per function.

Scale design notes
------------------
- exact_dedup: one shuffle on the normalized key. Representative choice
  is deterministic (min id), so reruns/oracles agree.
- minhash: explode-to-shingles then ONE groupBy(doc) computing all K
  min-hashes in a single aggregation pass (not K passes).
- LSH banding: candidate generation joins on (band, band_hash) — the
  classic s-curve tradeoff; bucket join shuffles only signature rows
  (K longs/doc), never full texts.
- shingle self-join (exact Jaccard) blocks on shingles with a document
  frequency cap: a stop-shingle appearing in d docs would generate
  O(d^2) candidate pairs, so frequent shingles are dropped from
  candidate generation (standard blocking; threshold configurable).
- simhash: 64 bit-sums in one aggregation; near-pair search bands the
  fingerprint into 4x16-bit chunks (pigeonhole: hamming<=3 implies an
  identical chunk), joins on chunks, verifies with bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lowercase, strip punctuation,
    collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def exact_dedup(
    df: DataFrame, id_col: str, key_cols: list[str] | Column
) -> DataFrame:
    """Exact dedup with a deterministic representative per group.

    Returns one row per distinct key: (key..., rep_id = min(id),
    n_dups). Unlike dropDuplicates (arbitrary survivor), min(id) is
    stable across runs/partitionings — required for oracle parity and
    for reproducible pipelines. One shuffle on the key."""
    key = key_cols if isinstance(key_cols, Column) else None
    if key is not None:
        grouped = df.groupBy(key.alias("dedup_key"))
    else:
        grouped = df.groupBy(*key_cols)
    return grouped.agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def word_shingles(toks_col: Column, k: int = 5) -> Column:
    """Distinct word k-shingles from a TOKENS column.

    Takes an already-projected token array, not the raw text: inlining
    the split+regex normalization into the transform lambda would make
    Catalyst re-evaluate it per shingle index — O(tokens^2) regex work
    per document (it dominated the whole shingling stage when measured)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks_col) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i + 1, F.lit(k))),
        )
    )


def normalize_sql(text_col: str) -> str:
    """normalize_text as a SQL expression string (for use inside expr)."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({text_col}),"
        f" '[^\\\\p{{L}}\\\\p{{N}}\\\\s]', ' '), '\\\\s+', ' '))"
    )


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, shingle) pairs; optionally drops shingles whose document
    frequency exceeds max_doc_freq (stop-shingle blocking — prevents
    O(d^2) pair blowup on hot shingles at scale)."""
    toks = F.split(F.expr(normalize_sql(text_col)), r"\s+")
    out = df.select(F.col(id_col).alias("doc"), toks.alias("_toks")).select(
        "doc", F.explode(word_shingles(F.col("_toks"), k)).alias("sh")
    )
    if max_doc_freq is not None:
        rare = (
            out.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_doc_freq)
            .select("sh")
        )
        out = out.join(rare, "sh")
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact word-k-shingle Jaccard near-dup pairs (id_a < id_b, jaccard
    >= threshold), blocked on shared rare shingles.

    Shuffles: shingle explode + groupBy (sizes), self-join on shingle
    (candidates), groupBy pair (intersection counts). Candidate count is
    bounded by the doc-frequency cap."""
    sh = exploded_shingles(df, id_col, text_col, k, max_doc_freq).cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, num_hashes: int = 64
) -> DataFrame:
    """MinHash signatures: (id, sig array<long>[num_hashes]).

    One explode + ONE aggregation computing all num_hashes minima
    (xxhash64 with per-permutation seed). Deterministic across runs."""
    sh = exploded_shingles(df, id_col, text_col, k)
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    sig = sh.groupBy("doc").agg(*aggs)
    return sig.select(
        F.col("doc").alias(id_col),
        F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate pairs from LSH banding + signature-estimated Jaccard.

    bands=16 over a 64-hash signature -> rows_per_band=4; the s-curve
    catches jaccard>=~0.5 with high probability. Estimated jaccard =
    fraction of agreeing signature positions (unbiased MinHash
    estimator); pairs below threshold are dropped."""
    num_hashes = 64
    rows_per = num_hashes // bands
    # cache: the banded self-join would recompute the signature
    # aggregation per alias (K longs per doc cached)
    signatures = signatures.cache()
    banded = signatures.select(
        F.col(id_col).alias("doc"),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * rows_per + r)
                                    for r in range(rows_per)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sig", "bk.band", "bk.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),"
        " 0, (acc, v) -> acc + v)"
    ) / F.lit(64.0)
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.7
) -> DataFrame:
    """Near-dup groups: each doc mapped to a representative (min id over
    its LSH-confirmed neighbors, single-hop). Returns (id, rep_id,
    is_dup). Single-hop covers pairwise-planted duplication; transitive
    chains longer than one hop would need iterated propagation."""
    sigs = minhash_signatures(df, id_col, text_col)
    pairs = minhash_lsh_pairs(sigs, id_col, threshold=threshold)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    rep = edges.groupBy("src").agg(F.min("dst").alias("min_nbr"))
    all_ids = df.select(F.col(id_col).alias("src"))
    return (
        all_ids.join(rep, "src", "left")
        .select(
            F.col("src").alias(id_col),
            F.least(F.col("src"), F.coalesce(F.col("min_nbr"), F.col("src"))).alias(
                "rep_id"
            ),
        )
        .withColumn("is_dup", F.col("rep_id") != F.col(id_col))
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """64-bit SimHash per document from normalized word tokens.

    One explode + one aggregation of 64 signed bit-sums; fingerprint
    reassembled as a long. Deterministic (xxhash64 token hashes)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(f"split({normalize_sql(text_col)}, '\\\\s+')")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.xxhash64(F.col("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc").agg(*bit_aggs)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col("doc").alias(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    fingerprints: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming.

    Banding is pigeonhole-exact: the fingerprint splits into
    max_hamming+1 chunks, so any pair within the threshold shares at
    least one identical chunk — 100% recall, no tuning. Tradeoff: more
    chunks -> narrower chunks -> more false candidates per bucket; for
    web-scale corpora prefer a smaller max_hamming (wider chunks) or an
    extra prefix-blocking key."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    # materialize before the self-join: both aliases would otherwise
    # recompute the 64-bit-sum aggregation (one long per doc cached —
    # ~8 bytes/doc cluster-wide, fine at any corpus size)
    fingerprints = fingerprints.cache()
    chunks = fingerprints.select(
        F.col(id_col).alias("doc"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), width * c)
                        .bitwiseAND(F.lit(mask))
                        .alias("ck"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc", "simhash", "ch.chunk", "ch.ck")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
