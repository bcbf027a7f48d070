"""Regenerate PLANS.md: formatted physical plans for representative
catalog queries, with the scale property each plan is supposed to
exhibit. Run after changing any of the listed queries:

    PYTHONPATH=/root/repo python tools/dump_plans.py

The claims column is enforced by tests/test_plan_quality.py; this file
is the human-readable evidence trail (pushdown, broadcast, partial
aggregation, TakeOrdered, no Python in JVM-only paths).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rocketmq_flink_spark.plans.catalog import REGISTRY  # noqa: E402
from rocketmq_flink_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, the scale property the plan must show)
AUDIT = [
    ("q1_pricing_summary",
     "single lineitem scan with shipdate PushedFilter + 7-column pruning; "
     "round-robin spread of the single-row-group scan so the partial "
     "DECIMAL hash-agg parallelizes (metadata no-op at scale), then one "
     "exchange on 6 groups"),
    ("q3_shipping_priority",
     "customer dim broadcast; filters pushed to every parquet scan; "
     "TakeOrderedAndProject for the top-10 (no global sort)"),
    ("q21_waiting_suppliers",
     "EXISTS/NOT-EXISTS as single hash semi/anti joins on orderkey — no "
     "per-row subquery probes; nation-supplier side broadcast"),
    ("topk_orders_per_segment",
     "rank window bounded per segment, then filter — no global sort of "
     "orders"),
    ("ngram_jaccard_dedup",
     "map-side-combined groupBy(sh) for the doc-freq cap; hot set "
     "broadcast anti-join; only 8-byte hashed shingle keys shuffle"),
    ("minhash_dedup_groups",
     "map-only signature computation (no shuffle before banding); banded "
     "equi-join candidates"),
    ("hll_distinct_parts",
     "register build = one partial-agg groupBy((flag,bucket)) — at most "
     "m rows per group reach the exchange regardless of input size"),
    ("countmin_token_counts",
     "counter build = one partial-agg groupBy((r,c)) into d*w cells; "
     "probe joins the broadcast sketch"),
    ("knn_exact_topk",
     "one corpus pass with map-side local top-k pruning (vectors never "
     "grid-shuffle; ~k survivor rows per query per batch); decimal "
     "re-rank via per-query window, no cartesian"),
    ("fuzzy_decontamination_report",
     "benchmark grams + probes broadcast; corpus chunks never shuffle "
     "for candidate generation; Levenshtein only on candidates"),
    ("lm_surprisal_by_source",
     "aggregate-first LM scoring: one tokenize pass into a "
     "(grp,w1,w2) partial-agg; count tables derived by re-aggregation "
     "and broadcast-joined back onto vocabulary-bounded rows, zero "
     "Python"),
    ("pq_ann_topk",
     "ADC scoring = broadcast hash join of exploded 4-byte codes against "
     "the queries x m x k LUT; only shortlist rows touch full vectors"),
    ("deterministic_corpus_shuffle",
     "shard positions from the EXACT distributed rank "
     "(operators/ranking.py): range buckets on the uniform 8-byte hash, "
     "bucket-partitioned sorts + broadcast offset join — no "
     "single-partition WindowExec anywhere; no Python"),
    ("zorder_skipping_report",
     "Morton key is a pure codegen bit expression evaluated only on "
     "the branch ordered by it; 32-tile bucketing is the EXACT "
     "distributed ntile (ranking.distributed_ntile) over a "
     "deterministic 1-in-8 sample — no single-partition window "
     "(production re-layout path is repartitionByRange)"),
    ("semantic_dedup_drops",
     "within-cluster pair generation is a hash equi-join on the "
     "cluster id — never cartesian; decimal cosine on pairs only"),
    ("bloom_decontamination",
     "Bloom probe is a constant-folded scalar expression (no join, no "
     "Python); exact flag is a broadcast left join; only the per-doc "
     "flag aggregation shuffles"),
    ("fuzzy_name_matches",
     "SymSpell variant blocking: hash equi-join on 8-byte xxhash64 "
     "variant keys with an integer index predicate — no cartesian, no "
     "nested loop; exact levenshtein only as collision guard"),
    ("line_dedup_docs",
     "hot-line decision = map-side-combined groupBy over 8-byte line "
     "hashes feeding a LeftAnti hash join — no Window over the line key; "
     "one rebuild shuffle keyed by doc id"),
    ("pagerank_copurchase",
     "per iteration: one hash join edges x scores on src + one "
     "map-side-combinable groupBy(dst); BIGINT floor-div arithmetic, "
     "no driver sync, TakeOrdered final top-20"),
    ("bpe_segment_corpus",
     "segmentation computed once per distinct word (vocab-bounded) and "
     "joined to per-(source, word) counts — the token stream is never "
     "re-processed per merge step"),
    ("containment_pairs_docs",
     "same rare-shingle blocking as the Jaccard pairs; threshold decided "
     "by integer cross-multiplication before any double appears"),
    ("token_drift_report",
     "one tokenize pass; map-side-combined (token,half) counts; "
     "scalar totals broadcast; TakeOrdered top-k of drift scores"),
    ("adamic_adar_links",
     "1/log2(deg) weight table broadcasts to the edges; the "
     "common-neighbor enumeration is a capped self-equi-join on the "
     "neighbor key (deg <= 64 hosts); TakeOrdered top-20 — no "
     "cartesian, no global sort"),
    ("gini_order_concentration",
     "ordered prefix pass over DISTINCT cent values only; row-level "
     "work is one map-side-combined histogram groupBy"),
    ("rfm_user_segments",
     "quartile cuts from distinct-value histograms (three bounded "
     "ordered passes), broadcast back as thresholds — no ntile window "
     "over the growing user dimension"),
    ("contiguous_id_assignment",
     "two-phase dense numbering: bucket counts -> broadcast prefix "
     "offsets -> per-bucket hash-distributed windows; no "
     "single-partition global window"),
    ("selectivity_estimation_report",
     "one 3-scalar stats collect inlined as literals (r6): two "
     "map-side histogram aggregates, the 2-pass distributed ntile "
     "(domain+total supplied, no stats scan), and a single "
     "conditional-agg scan for the true counts — no theta join, no "
     "re-evaluated stats subplan, windows partitioned by range bucket"),
    ("conformal_spend_interval",
     "calibration quantile selected rank-exactly from the "
     "distinct-residual histogram via distributed_prefix (r7): bucketed "
     "prefix sums, bucket-partitioned windows only — never a "
     "partition-less rank over the user dimension"),
    ("nb_confidence_margin",
     "margin quartiles from the exact distributed ntile (r7): range "
     "buckets on margin ticks + broadcast offset join + "
     "bucket-partitioned row_number — never a partition-less ntile "
     "over doc-scale margins"),
    ("per_queue_watermark_skew",
     "one 8-group agg for the per-queue watermarks, broadcast back "
     "across events with the global-min scalar — a single events scan "
     "feeds both lateness counts; no window, no shuffle beyond the "
     "8-key groupBys (r8 W2 anchor)"),
    ("restart_offsets_replay",
     "two bounded broker scans split by the per-queue offset snapshot "
     "(endingOffsets/startingOffsets), unioned and map-side-combined "
     "per event_type; snapshot is 8 driver scalars, the SS offset-log "
     "cost (r8 W7 anchor)"),
]


def main() -> None:
    spark = get_spark(app_name="dump_plans")
    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Generated by tools/dump_plans.py at {SF} (regenerate after",
        "changing any listed query). Each section states the scale",
        "property the plan must exhibit, then the `explain('formatted')`",
        "output proving it. Plan-shape regressions are caught by",
        "tests/test_plan_quality.py; this file is the readable evidence.",
        "",
    ]
    for name, claim in AUDIT:
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"**Scale property:** {claim}", "",
                "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
