"""Text analysis operators for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split/regexp/higher-order functions) —
whole-stage-codegen'd, no Python in the row path. Each operator has an
exact SQL twin so the DuckDB oracle can verify it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.lineage import cut

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: ties broken by list order (documented, deterministic).
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "es": ["el", "la", "los", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "des", "est"],
    "zh": ["de", "le", "shi", "zai", "he"],
}


def tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def token_count(text_col: str) -> Column:
    """Whitespace token count (0 for NULL/empty/blank text — a corpus at
    scale WILL contain null text; counting it as 0 keeps every
    downstream integer-exact instead of null-propagating)."""
    return F.when(
        F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(tokens(text_col)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    alpha ratio, whitespace ratio, uppercase-start ratio."""
    toks = tokens(text_col)
    n_tok = token_count(text_col)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    n_space = F.length(F.regexp_replace(F.col(text_col), r"[^\s]", ""))
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "mean_token_len": F.round(
                (n_chars - n_space) / F.greatest(n_tok, F.lit(1)), 6
            ),
            "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6),
            "space_ratio": F.round(n_space / F.greatest(n_chars, F.lit(1)), 6),
        }
    )


def stopword_score(text_col: str, words: list[str]) -> Column:
    """Number of tokens that are in the stopword list (with repeats)."""
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split(trim(lower({text_col})), '\\\\s+'),"
        f" t -> t IN ({in_list})))"
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-hit counts, ties broken
    by STOPWORDS declaration order. Adds `pred_lang` and per-language
    score columns (score_<lang>)."""
    out = df
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"score_{lang}", stopword_score(text_col, words))
    langs = list(STOPWORDS)
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("pred_lang", pred)


def fingerprint(text_col: str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, punctuation stripped, whitespace collapsed)."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    return F.md5(F.expr(normalize_sql(text_col)))


# GPT-2-style pretokenizer pattern (public: the regex from the GPT-2 BPE
# paper/code), minus possessive-quantifier syntax Java/RE2 lack:
# contractions, letter runs (with optional leading space), digit runs,
# non-space-non-alnum punctuation runs, whitespace runs.
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_pretoken_count(text_col: str) -> Column:
    """BPE-ish token count: number of GPT-2-style pretokens, excluding
    pure-whitespace matches. A practical "how many tokens will the
    tokenizer see" estimator that runs as one JVM-side regexp per row —
    the real BPE merge table isn't needed for counting pretokens."""
    return F.size(
        F.filter(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), F.lit(0)),
            lambda t: ~t.rlike(r"^\s+$"),
        )
    )


def rolling_hash_fingerprint(norm_col: Column | str, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: min portable 60-bit hash
    (functions/porthash.py — DuckDB-reproducible) over the character
    k-gram windows of ALREADY-NORMALIZED text. A single-value document
    sketch robust to content reordering at the edges (complements the
    exact md5 fingerprint).

    Pass a projected plain column (e.g. select
    `normalize_text(...).alias("_norm")` first), NOT an inline
    normalization expression: Catalyst re-evaluates whatever expression
    tree sits inside the transform() lambda once per window position, so
    an inlined regex chain turns an O(len) scan into O(len^2) regex
    work per document."""
    from rocketmq_flink_spark.functions.porthash import hash60

    norm = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    grams = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(norm) - window + 1, F.lit(1)),
        ),
        lambda i: hash60(norm.substr(i, F.lit(window))),
    )
    return F.array_min(grams)


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Within-document repetition signals (the Gopher quality-filter
    family adapted to single-line documents): counts over ALL n-gram
    occurrences (not distinct) of the normalized token stream.

    Returns (id_col, n_ngrams, dup_ngram_occ, top_ngram_count):
    total n-gram occurrences, occurrences belonging to n-grams that
    appear more than once in the document, and the count of the most
    frequent n-gram. Downstream filters derive exact-ratio cuts from
    the integer counters (e.g. drop when 5*dup_ngram_occ >= n_ngrams,
    the "0.2 duplicate-bigram fraction" rule) — no floats anywhere, so
    the result is bit-stable at any partition count.

    Scale: explode all occurrences -> ONE (doc, gram) count agg ->
    ONE per-doc agg. Both shuffles are map-side combined; nothing is
    quadratic in document length.
    """
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = F.split(F.expr(normalize_sql(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col).alias("doc"), toks.alias("_toks")
    ).select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))
                ),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, F.lit(n))),
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_gram.groupBy("doc").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_ngram_occ"
        ),
        F.max("cnt").alias("top_ngram_count"),
    ).select(
        F.col("doc").alias(id_col),
        "n_ngrams",
        "dup_ngram_occ",
        "top_ngram_count",
    )


def quality_filter_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 10,
    max_mean_token_len_x10: int = 100,
    min_alpha_permille: int = 550,
    max_dup_bigram_permille: int = 200,
) -> DataFrame:
    """C4/Gopher-style quality filter chain with per-rule attribution.

    Four rules, every one an EXACT integer comparison (thresholds are
    scaled integers — x10 / permille — so no float ever decides a keep):
      short     : n_tokens < min_tokens
      meanlen   : 10 * (chars - spaces) > max_mean_token_len_x10 * n_tokens
      alpha     : 1000 * n_alpha < min_alpha_permille * n_chars
      repetitive: 1000 * dup_bigram_occ > max_dup_bigram_permille * n_ngrams

    Returns (id_col, n_tokens, fail_rule, kept) where fail_rule is the
    FIRST failing rule's name ('' when kept) — deterministic drop
    attribution, the thing a pipeline dashboard actually needs.

    Scale: the char-level signals are pure per-row expressions; the only
    shuffles are the two map-side-combined aggs inside
    repetition_features. One corpus pass overall.
    """
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    # NULL text must FAIL the filter (as 'short'), not null-propagate
    # through every comparison into kept=True — at corpus scale null
    # text is a fact of life, and "null sneaks past the filter" is the
    # classic silent-keep bug.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    norm = f"coalesce({normalize_sql(text_col)}, '')"
    toks = F.split(F.expr(norm), r"\s+")
    n_tok = F.when(F.expr(norm) == "", F.lit(0)).otherwise(F.size(toks))
    n_chars = F.length(txt)
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    n_space = F.length(F.regexp_replace(txt, r"[^\s]", ""))
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("_nc"),
        n_alpha.alias("_na"),
        (n_chars - n_space).alias("_nw"),
    )
    rep = repetition_features(df, id_col, text_col, n=2)
    j = base.join(rep, id_col)
    fail = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("short"))
        .when(
            10 * F.col("_nw")
            > F.lit(max_mean_token_len_x10) * F.greatest(F.col("n_tokens"), F.lit(1)),
            F.lit("meanlen"),
        )
        .when(
            1000 * F.col("_na")
            < F.lit(min_alpha_permille) * F.greatest(F.col("_nc"), F.lit(1)),
            F.lit("alpha"),
        )
        .when(
            1000 * F.col("dup_ngram_occ")
            > F.lit(max_dup_bigram_permille) * F.greatest(F.col("n_ngrams"), F.lit(1)),
            F.lit("repetitive"),
        )
        .otherwise(F.lit(""))
    )
    return j.select(
        F.col(id_col),
        "n_tokens",
        fail.alias("fail_rule"),
        (fail == "").alias("kept"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k characteristic terms per document by a log-free tf-idf:
    score = tf * (N * scale div df) — term frequency times scaled
    inverse document frequency, computed entirely in BIGINT integer
    arithmetic so ranking and score are bit-identical in any engine at
    any partition count (log-damped tf-idf would hinge on libm ULPs).

    Returns (id_col, tok, tf, df, tfidf_scaled), k rows per document,
    ties broken by token text ascending.

    Scale: one (doc, tok) count agg; the token->df probe is the
    Zipf-skewed join (AQE skew handling applies); the final ranking
    window partitions per document — thousands of tiny partitions, no
    hot key possible.
    """
    from pyspark.sql import Window

    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.split(F.expr(normalize_sql(text_col)), r"\s+")
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    tf = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.cache()  # reused: df aggregation + the scored probe
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_scaled",
            F.expr(f"tf * ((n_docs * CAST({scale} AS BIGINT)) div df)"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("tfidf_scaled"), F.asc("tok")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(
            F.col("doc").alias(id_col), "tok", "tf", "df", "tfidf_scaled"
        )
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) implement identically: no lookaround, no backreferences.
# Redaction order is the dict order (email first: an address contains
# dots that the ipv4 pattern must never see first).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[- .]\d{3}[- .]\d{4}",
}


def pii_counts(text_col: str) -> dict[str, Column]:
    """Per-kind PII match counts as named columns ({kind: count})."""
    return {
        f"n_{kind}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: str) -> Column:
    """Text with every PII match replaced by a <KIND> placeholder.

    Pure JVM-side regexp_replace chain (one pass per kind) — no Python
    in the row path; kinds are applied in PII_PATTERNS order so earlier
    redactions cannot create or destroy later matches differently
    across engines."""
    out: Column = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def rarity_scores(
    df: DataFrame, id_col: str, text_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Corpus-frequency rarity score per document — a perplexity proxy
    for quality filtering without a language model: score = mean over
    the document's tokens of (corpus_tokens / token_frequency), i.e.
    the average inverse unigram probability. Common-word documents
    score near the corpus mean; documents of rare tokens (gibberish,
    boilerplate IDs) score high.

    Determinism: the per-token ratio is computed as BIGINT integer
    division `(N * scale) div freq` — bit-identical in any engine —
    and summed exactly as integers; the single final double division
    is rounded. No floating-point accumulation anywhere, so the score
    is reproducible at any partition count (the same trick as the
    exact-moment statistics).

    Scale: one explode + one count agg builds the vocabulary; the
    token->frequency equi-join is the Zipf-skewed hot spot at corpus
    scale — AQE skew-join splits the hot-token partitions (enabled in
    the session defaults); one final agg per doc.
    """
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.split(F.expr(normalize_sql(text_col)), r"\s+")
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    toks = toks.cache()  # reused by vocab and by the join probe side
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    n_total = vocab.agg(F.sum("freq").alias("n_total"))
    scored = (
        toks.join(vocab, "tok")
        .join(F.broadcast(n_total))
        .select(
            "doc",
            F.expr(f"(n_total * CAST({scale} AS BIGINT)) div freq").alias(
                "scaled"
            ),
        )
    )
    return scored.groupBy("doc").agg(
        F.round(
            F.sum("scaled").cast("double")
            / F.lit(float(scale))
            / F.count(F.lit(1)),
            6,
        ).alias("rarity"),
        F.count(F.lit(1)).alias("n_tok"),
    ).select(F.col("doc").alias(id_col), "rarity", "n_tok")


def bigram_surprisal(
    df: DataFrame, id_col: str, text_col: str, group_col: str | None = None
) -> DataFrame:
    """Quantized bigram language-model surprisal — the CCNet-style
    "perplexity filter" signal, in exact integer arithmetic.

    The corpus itself is the LM: c1(w) = occurrences of w as a bigram
    context, c2(w1,w2) = bigram occurrences. Per bigram instance the
    quantized surprisal is floor(log2 c1) - floor(log2 c2) — the
    integer part of -log2 P(w2|w1) — computed as a bin()-length
    difference, so scores are EXACT (no libm log whose last ulp
    differs between engines) and distributed sums are
    order-independent BIGINTs. Returns per-group (or per-doc when
    group_col is None): n_bigrams and mean quantized surprisal.

    Scale: aggregate-first — the raw bigram instance stream is
    collapsed to per-(group, w1, w2) counts in ONE map-side-combined
    pass, the context/bigram count tables are derived from THAT (pure
    re-aggregation, no second tokenize), and the instance-level score
    sum is recovered exactly as sum(n * (floor_log2(c1) -
    floor_log2(c2))). Joins therefore move vocabulary-bounded
    aggregate rows, never the token stream: at corpus scale the
    instance stream is O(tokens) while the grouped table is
    O(distinct bigrams per group) — orders of magnitude smaller —
    and the same restructuring is what makes the score mergeable
    across shards. No driver state, no Python."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    key = group_col or id_col
    toks = F.split(F.expr(normalize_sql(text_col)), r"\s+")
    # The <2-token guard lives INSIDE the expression (empty array ->
    # explode drops the doc) rather than as a .where(size(_toks) >= 2):
    # Catalyst pushes such a filter below the projection and
    # re-substitutes the full normalize+split into the predicate —
    # doubling the regex work, which dominates this pass (measured).
    bg = (
        df.select(F.col(key).alias("grp"), toks.alias("_toks"))
        .select(
            "grp",
            F.explode(
                F.expr(
                    "CASE WHEN size(_toks) >= 2 THEN"
                    " transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS w1, _toks[i+1] AS w2))"
                    " ELSE array() END"
                )
            ).alias("b"),
        )
        .select("grp", "b.w1", "b.w2")
    )
    g3 = bg.groupBy("grp", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    c2 = g3.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    c1 = g3.groupBy("w1").agg(F.sum("n").alias("c1"))
    scored = (
        g3.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "grp",
            "n",
            (
                F.col("n")
                * (F.length(F.bin(F.col("c1"))) - F.length(F.bin(F.col("c2"))))
            ).alias("sq_sum"),
        )
    )
    return (
        scored.groupBy("grp")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.round(
                F.sum("sq_sum").cast("double") / F.sum("n"), 6
            ).alias("mean_surprise_q"),
        )
        .withColumnRenamed("grp", key)
    )


def vocab_coverage(
    df: DataFrame, strata_col: str, text_col: str = "text", ngram: int = 1
) -> DataFrame:
    """Vocabulary coverage / exclusivity audit per corpus stratum
    (source, domain, language): how much of the corpus vocabulary each
    stratum exercises, and how much of its vocabulary exists nowhere
    else — the tokenizer-coverage / domain-novelty numbers a mixture
    designer reads before reweighting sources. `ngram` sizes the\n    vocabulary unit (1 = unigrams; 2+ = word n-grams, the standard\n    trick when the unigram vocabulary is saturated).

    Per stratum: n_tokens (occurrences), n_distinct (vocabulary),
    coverage = n_distinct / corpus vocabulary, n_exclusive (tokens in
    NO other stratum), exclusive_rate = n_exclusive / n_distinct. All
    counts exact integers; ratios explicitly rounded — hash-checkable.

    Scale: one map-side-combined groupBy(stratum, token) collapses the
    token stream to vocabulary-bounded rows; everything downstream
    (per-stratum rollup, per-token stratum counts, the global vocab
    scalar) aggregates those, so shuffle volume is O(|vocab| x
    |strata|), independent of corpus row count."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    grams = (
        f"CASE WHEN size(_toks) >= {ngram} THEN"
        f" transform(sequence(0, size(_toks) - {ngram}),"
        f" i -> concat_ws(' ', slice(_toks, i + 1, {ngram})))"
        f" ELSE array() END"
    )
    toks = (
        df.selectExpr(
            f"{strata_col} AS stratum",
            f"filter(split({normalize_sql(text_col)}, '\\\\s+'),"
            f" x -> x <> '') AS _toks",
        )
        .select("stratum", F.explode(F.expr(grams)).alias("tok"))
    )
    # stc feeds THREE subtrees (per-stratum rollup, per-token stratum
    # counts, the exclusivity join) and tokl two — without the cuts the
    # n-gram explode re-ran per consumer (optimization r08)
    stc = cut(toks.groupBy("stratum", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    ), big=True)
    per = stc.groupBy("stratum").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    tokl = cut(stc.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_strata")
    ), big=True)
    vocab = tokl.agg(F.count(F.lit(1)).alias("corpus_vocab"))
    # NOT broadcast: at web scale the single-stratum token set is
    # dominated by hapax legomena (most of the vocabulary) — it shuffle-
    # joins against the already-vocab-bounded (stratum, tok) rows.
    excl = (
        stc.join(tokl.where(F.col("n_strata") == 1), "tok")
        .groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("n_exclusive"))
    )
    return (
        per.crossJoin(F.broadcast(vocab))
        .join(excl, "stratum", "left")
        .na.fill({"n_exclusive": 0})
        .select(
            "stratum",
            "n_tokens",
            "n_distinct",
            "corpus_vocab",
            F.round(F.col("n_distinct") / F.col("corpus_vocab"), 6)
            .alias("coverage"),
            "n_exclusive",
            F.round(F.col("n_exclusive") / F.col("n_distinct"), 6)
            .alias("exclusive_rate"),
        )
    )


def pmi_collocations(
    df: DataFrame, text_col: str = "text", min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-k adjacent-word collocations ranked by PMI lift — the
    phrase-mining signal a tokenizer/embedding pipeline uses to decide
    which word pairs deserve a single token ("new york", "machine
    learning").

    Ranks by lift = p(w1,w2) / (p(w1)·p(w2)) = (c12·N·N) / (M·c1·c2)
    — exp(PMI), the SAME ordering as PMI but with no libm log whose
    last ulp differs between engines: the score is a fixed-order IEEE
    multiply/divide chain over exact BIGINT counts, bit-identical in
    Spark and DuckDB, so the ranking is oracle-checkable.

    Scale: aggregate-first, same restructuring as bigram_surprisal —
    bigram instances collapse to per-(w1,w2) counts in one map-side-
    combined pass; the unigram table is vocab-bounded; the two
    count-joins and the totals cross-join move aggregate rows, never
    the token stream; min_count prunes the long tail BEFORE the joins;
    top-k runs as TakeOrdered (no global sort)."""
    from rocketmq_flink_spark.operators.dedup import normalize_sql

    toks = F.split(F.expr(normalize_sql(text_col)), r"\s+")
    t = df.select(toks.alias("_toks"))
    uni = (
        t.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = t.select(
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 2 THEN"
                " transform(sequence(0, size(_toks) - 2),"
                " i -> struct(_toks[i] AS w1, _toks[i+1] AS w2))"
                " ELSE array() END"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    totals = uni.agg(F.sum("c").alias("n_tok")).crossJoin(
        big.agg(F.sum("c12").alias("m_big"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = (
        big.where(F.col("c12") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                ((d("c12") * d("n_tok")) * d("n_tok"))
                / ((d("m_big") * d("c1")) * d("c2")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(k)
