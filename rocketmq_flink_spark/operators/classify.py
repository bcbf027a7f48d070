"""Distributed text classification: hashed-feature multinomial
Naive Bayes in exact fixed-point integer arithmetic.

The quality-classifier primitive of a pretraining-data pipeline
(fastText-style source/quality scoring): train a multinomial NB over
hashed unigram features (the DSIR feature space — B-bucket hash of
normalized tokens), predict the class of held-out documents, report a
confusion matrix.

Exactness design — NB decision rule is argmax_c [ log P(c) +
sum_tokens log P(bucket|c) ]. Logs are floats in every textbook
implementation; here every log is the FIXED-POINT base-2 log of an
integer ratio (operators/retrieval.py fp_log2: 20 fraction bits,
repeated-squaring bit extraction — bit-equal as a Catalyst fold, a
DuckDB recursive CTE, and pure Python). Base-2 vs natural log is
irrelevant: argmax is invariant under uniform positive scaling of all
logs. Laplace smoothing: P(b|c) = (cnt(b,c)+1)/(tot_c+B); prior =
ndocs_c/ndocs — both ratios <= 1, so every tick is the NEGATED
fp_log2 of the flipped ratio (no sign branch needed). Scores are exact
BIGINT sums; argmax ties break on the smallest class label — the
whole confusion matrix is bit-reproducible across engines.

Scale design: training is ONE map-side-combinable (class, bucket)
count over the token stream (the classic "NB training is a groupBy"
property — no iterations, no driver sync). The model is (buckets x
classes) rows — bounded by B * |classes| (8192 * S), kilobytes — and
BROADCASTS to the prediction join, so scoring is one pass over test
tokens with partial aggregation; no shuffle grows with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rocketmq_flink_spark.operators.lineage import cut
from rocketmq_flink_spark.operators.retrieval import fp_log2_sql


def nb_train(
    train_occ: DataFrame,
    buckets: int,
    doc_col: str = "doc_id",
    class_col: str = "source",
    bucket_col: str = "b",
) -> tuple[DataFrame, DataFrame]:
    """Train hashed-feature multinomial NB from a token-occurrence
    stream (one row per token occurrence: doc, class, bucket).

    Returns (counts, priors):
      counts = (class, bucket, cnt) observed feature counts plus a
               per-class total `tot` — the sufficient statistics;
      priors = (class, prior_ticks) with prior_ticks =
               -fp_log2(ndocs / ndocs_c) (documents with >= 1 token).
    Both are class/bucket-bounded (model-sized, broadcastable)."""
    occ = train_occ.select(
        F.col(doc_col).alias("doc"),
        F.col(class_col).alias("c"),
        F.col(bucket_col).alias("b"),
    )
    # cnt is the ONE corpus-width training aggregation; it feeds the
    # per-class totals AND the model grid join, and `counts` is itself
    # consumed twice by nb_model_ticks — without cuts each consumer
    # re-ran the train pass over the occurrence stream (18 occurrence
    # re-reads / 48 Exchanges in the nb_auc plan). Both frames are
    # model-bounded (<= B * |classes| rows), so the cuts are cheap and
    # every join against them is broadcast-pinned (cut leaves carry no
    # size statistics — optimization r09, VERDICT r8 items 4/7).
    cnt = cut(occ.groupBy("c", "b").agg(F.count(F.lit(1)).alias("cnt")))
    tot = cnt.groupBy("c").agg(F.sum("cnt").cast("long").alias("tot"))
    counts = cut(cnt.join(F.broadcast(tot), "c"))
    nd = cut(
        occ.select("doc", "c")
        .distinct()
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("ndc"))
    )
    total = nd.agg(F.sum("ndc").cast("long").alias("ndall"))
    priors = nd.crossJoin(F.broadcast(total)).selectExpr(
        "c",
        f"-({fp_log2_sql('ndall', 'ndc')}) AS prior_ticks",
    )
    return counts, priors


def nb_model_ticks(
    counts: DataFrame, test_buckets: DataFrame, buckets: int
) -> DataFrame:
    """Materialize per-(class, bucket) log-likelihood ticks for every
    bucket occurring in the test stream: ticks = -fp_log2(
    (tot_c + B) / (cnt + 1)) — the Laplace-smoothed log P(b|c).
    Unobserved (class, bucket) pairs get cnt = 0 via the left join, so
    the model covers exactly the needed (test-bucket x class) grid:
    at most B * |classes| rows, always broadcastable."""
    cls = counts.select("c", "tot").distinct()
    grid = test_buckets.select("b").distinct().crossJoin(F.broadcast(cls))
    filled = grid.join(
        F.broadcast(counts.select("c", "b", "cnt")), ["c", "b"], "left"
    ).selectExpr(
        "c",
        "b",
        "coalesce(cnt, 0) + 1 AS a",
        f"tot + {buckets} AS q",
    )
    return filled.selectExpr(
        "c", "b", f"-({fp_log2_sql('q', 'a')}) AS ticks"
    )


def nb_scores(
    test_occ: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    doc_col: str = "doc_id",
    bucket_col: str = "b",
) -> DataFrame:
    """Score every test document against every class: (doc, c, score)
    exact BIGINT ticks. The model and priors broadcast; scoring is one
    partially-aggregated pass over the test token stream."""
    occ = test_occ.select(
        F.col(doc_col).alias("doc"), F.col(bucket_col).alias("b")
    )
    return (
        occ.join(F.broadcast(model), "b")
        .groupBy("doc", "c")
        .agg(F.sum("ticks").alias("s"))
        .join(F.broadcast(priors), "c")
        .select("doc", "c", (F.col("s") + F.col("prior_ticks")).alias("score"))
    )


def nb_predict(
    test_occ: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    doc_col: str = "doc_id",
    bucket_col: str = "b",
) -> DataFrame:
    """Argmax prediction per test document: (doc, predicted,
    score_ticks). Ties break on the smallest class label (total order
    — deterministic). The argmax is a map-side-combinable
    max(struct(score, -c)) aggregation, not a doc-partitioned
    row_number window: same (score desc, c asc) total order, but the
    shuffle carries one partial-max row per (doc, partition) instead
    of the full |docs| x |classes| score grid through a sort."""
    sc = nb_scores(test_occ, model, priors, doc_col, bucket_col)
    return (
        sc.groupBy("doc")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"), F.col("c").alias("c")
                )
            ).alias("m")
        )
        .select(
            F.col("doc"),
            F.col("m.c").alias("predicted"),
            (-F.col("m.ns")).alias("score_ticks"),
        )
    )
