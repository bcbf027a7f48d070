"""Training-data pipeline operators: sequence packing, deterministic
stratified sampling, vocabulary heavy-hitters.

Not in the reference (it is a connector); part of the north-star
extension surface (BASELINE.json: the operations a large-scale LLM
training-data pipeline needs on top of dedup/similarity/text analysis).

Scale design notes
------------------
- pack_sequences: one window (partitioned by the pack stream key,
  ordered by doc id) computing a running token total; pack assignment
  is a closed-form expression over the cumulative sum — no iterative
  bin-packing state, no driver loop. Each stream packs independently,
  so parallelism = number of streams; at 100 TB you pre-bucket the
  stream key (e.g. source x shard) so no single window partition
  exceeds an executor.
- stratified_sample: keep/drop is a pure function of (salt, id) via the
  portable 60-bit md5 hash — reproducible across runs, engines,
  partitionings, and cluster sizes; no sampling state, no RNG. Rates
  are expressed in permille per stratum.
- doc_frequency_topk: explode distinct tokens per doc -> one
  map-side-combined count agg -> global top-k via TakeOrdered (no full
  sort). Token set per doc is deduplicated BEFORE the shuffle, so hot
  tokens cost one row per (doc, token), not per occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions.porthash import hash60


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    stream_col: str,
    window_tokens: int,
) -> DataFrame:
    """Assign documents to fixed-budget context windows ("packs").

    Documents are taken in deterministic id order within each stream and
    placed consecutively; a document whose tokens would overflow the
    running window starts pack floor(cum_before / window_tokens) — the
    standard cumulative-fill rule (a doc may straddle the boundary; the
    budget is enforced in expectation, which is what sequence-packing
    pipelines do before truncation). Adds `pack_id`.

    One shuffle: the window partition on stream_col.
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return df.withColumn(
        "pack_id",
        F.floor((cum - F.col(tokens_col)) / F.lit(window_tokens)).cast("long"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling.

    A row survives iff hash60(salt || ':' || id) % 1000 < rate(stratum).
    The decision depends only on (salt, id), so reruns, engines and
    partitionings agree; changing the salt draws an independent sample.
    Adds nothing; returns the surviving rows.
    """
    rate = F.lit(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    bucket = hash60(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % F.lit(1000).cast("long")
    return df.where(bucket < rate)


def stratified_sample_sql(
    id_expr: str, strata_expr: str, rates_permille: dict[str, int],
    default_permille: int, salt: str = "sample",
) -> str:
    """The identical survival predicate as DuckDB SQL (oracle twin)."""
    from rocketmq_flink_spark.functions.porthash import hash60_sql

    rate = str(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = f"CASE WHEN {strata_expr} = '{k}' THEN {v} ELSE {rate} END"
    h = hash60_sql(f"'{salt}:' || CAST({id_expr} AS VARCHAR)")
    return f"(({h} % 1000) < {rate})"


def doc_frequency_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 20
) -> DataFrame:
    """Top-k tokens by document frequency (tokens deduplicated within
    each document before counting). Ties broken by token text so the
    top-k cut is total-ordered. Returns (tok, df)."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(
                F.split(F.expr(normalize_sql(text_col)), r"\s+")
            )
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(k)
    )


def mixture_weights(
    df: DataFrame,
    strata_col: str,
    tokens_col: str,
    budget_tokens: int,
    targets_permille: dict[str, int] | None = None,
    default_permille: int | None = None,
) -> DataFrame:
    """Domain-mixture reweighting: per-stratum sampling rates that hit a
    target token mixture under a total budget.

    For each stratum s with target share t_s (permille) and available
    tokens a_s: desired_s = budget * t_s div 1000, and the sampling
    rate is rate_s = min(1000, desired_s * 1000 div a_s) permille — all
    BIGINT integer arithmetic, so the plan (and the downstream
    stratified_sample keyed on these rates) is reproducible anywhere.
    A stratum with fewer tokens than desired is capped at 1000 (take
    everything; the shortfall is visible as desired - expected).

    Returns (strata_col, available_tokens, desired_tokens,
    rate_permille, expected_tokens) — one row per stratum; one
    aggregation shuffle over (stratum) counters.
    """
    if default_permille is None:
        default_permille = 0
    tgt = F.lit(default_permille)
    for k, v in sorted((targets_permille or {}).items()):
        tgt = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(tgt)
    avail = df.groupBy(strata_col).agg(
        F.sum(F.col(tokens_col)).alias("available_tokens")
    )
    return (
        avail.withColumn("_tgt", tgt.cast("long"))
        .withColumn(
            "desired_tokens",
            F.expr(f"CAST({budget_tokens} AS BIGINT) * _tgt div 1000"),
        )
        .withColumn(
            "rate_permille",
            F.least(
                F.lit(1000).cast("long"),
                F.expr(
                    "desired_tokens * 1000 div greatest(available_tokens, 1)"
                ),
            ),
        )
        .withColumn(
            "expected_tokens",
            F.expr("available_tokens * rate_permille div 1000"),
        )
        .drop("_tgt")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (RAG-style
    preprocessing): chunk i covers tokens [i*stride, i*stride +
    chunk_tokens) with stride = chunk_tokens - overlap. Returns
    (id, chunk_idx, chunk_text, n_tok). The final partial chunk is kept
    (standard behavior — truncation is a later pipeline stage's call);
    chunks that would START at/after the end are not emitted, so a doc
    shorter than chunk_tokens yields exactly one chunk.

    Scale: tokenization is projected ONCE per document before the
    window transform (inlining it would re-split per chunk index), and
    the whole operator is explode + slice built-ins — zero Python, no
    shuffle at all (embarrassingly parallel over documents).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = F.split(F.expr(normalize_sql(text_col)), r"\s+")
    base = df.select(
        F.col(id_col), F.filter(toks, lambda x: x != "").alias("_toks")
    ).select(
        id_col, "_toks",
        F.greatest(
            F.ceil(
                (F.size("_toks") - F.lit(overlap)) / F.lit(stride)
            ).cast("int"),
            F.lit(1),
        ).alias("_n_chunks"),
    )
    return base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n_chunks") - 1),
                lambda i: F.slice(
                    F.col("_toks"), i * stride + 1, chunk_tokens
                ),
            )
        ).alias("chunk_idx", "_chunk"),
    ).select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", "_chunk").alias("chunk_text"),
        F.size("_chunk").alias("n_tok"),
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    strata_col: str,
    n_per_stratum: int,
    salt: str = "pps",
) -> DataFrame:
    """Weighted sampling: systematic probability-proportional-to-size
    (PPS) selection of ~n units per stratum, inclusion probability
    proportional to an integer weight (token/char counts) — the
    sampler a mixture pipeline uses when "sample 1M documents but let
    long documents count for more" must be reproducible.

    Classic systematic PPS on the integer weight line: units are laid
    out in a deterministic pseudo-random order (portable 60-bit hash of
    salt:id — reshuffling the corpus or changing partitioning cannot
    change the sample), the stratum's weight line [1, T] is divided
    into n equal strides, and a unit is hit once for every stride
    boundary falling inside its weight interval:
    n_hits = floor(cum*n/T) - floor((cum-w)*n/T), ALL BIGINT (exact in
    any engine; cum*n stays under 2^63 for corpora up to ~9e15 weight
    at n=1000). Units with w > T/n can be hit multiple times (the
    standard PPS multiplicity, reported in n_hits); zero-weight units
    are never selected.

    Returns the selected rows: (strata, id, weight, n_hits). Shuffles:
    ONE window partition per stratum (the weight line must be summed in
    order); at 100 TB, strata are sources/domains — thousands of
    independent partitions, each bounded — not a global window."""
    h = hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    wl = (
        Window.partitionBy("stratum")
        .orderBy("_h", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("stratum")
    n = F.lit(n_per_stratum).cast("long")
    base = (
        df.select(
            F.col(strata_col).alias("stratum"),
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("long").alias("weight"),
            h.alias("_h"),
        )
        .withColumn("_cum", F.sum("weight").over(wl))
        .withColumn("_t", F.greatest(F.sum("weight").over(wt), F.lit(1)))
    )
    hits = F.expr("(_cum * _n) DIV _t - ((_cum - weight) * _n) DIV _t")
    return (
        base.withColumn("_n", n)
        .withColumn("n_hits", hits)
        .where(F.col("n_hits") >= 1)
        .select("stratum", "id", "weight", "n_hits")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Reconcile two corpus snapshots: per-document status by identity
    AND content — `added` (id only in new), `removed` (id only in old),
    `same` (id in both, identical content hash), `changed` (id in both,
    content differs). The ingest-audit primitive a continuously-updated
    corpus runs between versions before retraining decisions.

    One full-outer hash join on the id; content equality compares md5
    hashes computed map-side, so document text never joins — at 100 TB
    the shuffle moves (id, 32-byte hash) pairs only. Presence is
    tracked by explicit marker columns (NOT hash nullness: md5(NULL
    text) is NULL, which would misreport a NULL-text doc present in
    both snapshots as added/removed) and the hash comparison is
    null-safe, so two NULL-text versions compare as `same`. Returns
    (id, status)."""
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("_h_old"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("_h_new"),
        F.lit(1).alias("_in_new"),
    )
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_in_old").isNull(), "added")
            .when(F.col("_in_new").isNull(), "removed")
            .when(F.col("_h_old").eqNullSafe(F.col("_h_new")), "same")
            .otherwise("changed")
            .alias("status"),
        )
    )
