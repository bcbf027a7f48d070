"""Measure shuffle amplification per headline query: parquet bytes
scanned vs bytes written to shuffles, from the Spark UI /sql REST
endpoint's per-node metrics (Scan `size of files read`, Exchange
`shuffle bytes written` — the same numbers the SQL tab shows).

The shuffle/scan byte ratio is THE number that projects a local run to
cluster scale: scanned bytes grow linearly with corpus size, so a query
whose ratio is a small constant keeps its shuffle affordable at 100 TB,
while a ratio near or above 1 marks the stage to re-block, bucket or
broadcast first. Writes SHUFFLE.md.

Run: PYTHONPATH=/root/repo python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rocketmq_flink_spark.plans.catalog import REGISTRY  # noqa: E402

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_orders",
    "codec_roundtrip_agg",
    "dedup_exact_docs",
    "ngram_jaccard_dedup",
    "minhash_dedup_groups",
    "simhash_near_pairs",
    "repeated_passages",
    "knn_exact_topk",
    "ann_topk_lsh",
    "lm_surprisal_by_source",
    "hll_distinct_parts",
    "countmin_token_counts",
    "histogram_quantiles_events",
    "token_drift_report",
    "bloom_decontamination",
    "semantic_dedup_drops",
    "deterministic_corpus_shuffle",
    "fuzzy_name_matches",
    "line_dedup_docs",
    "pmi_collocations",
    "bpe_train_merges",
    "pagerank_copurchase",
    "containment_pairs_docs",
    "bm25_search_docs",
    "kmv_distinct_users",
    "dsir_importance_select",
    "pca_top_component_embeddings",
    "label_propagation_communities",
    "nb_source_classifier",
    "rrf_hybrid_search",
    "jl_projection_distortion",
    "source_vocab_jaccard",
    "triangle_count_copurchase",
    "heaps_law_vocab_growth",
    "lang_similarity_jsd",
    "kcore_peeling_copurchase",
    "last_touch_attribution",
    "kaplan_meier_signup_to_purchase",
    "gini_order_concentration",
    "adamic_adar_links",
    "zipf_slope_by_source",
    "ams_f2_tokens",
    "nb_auc_eval",
    "phrase_search_docs",
    "harmonic_centrality_seeds",
    "lpa_modularity_score",
    "association_rules_lift",
    "cross_source_duplication",
    # round 4 continuation 5
    "sssp_weighted_copurchase",
    "local_clustering_coefficient",
    "slope_one_brand_recs",
    "rake_keyword_extraction",
    "ppr_recommendations",
    "bitmap_segment_intersections",
    "query_likelihood_search",
    "token_burstiness_report",
    "ecod_anomaly_scores",
    "shapley_attribution",
    "point_in_time_features",
    "quantile_treatment_effect",
    # round 6 rewrites
    "selectivity_estimation_report",
    "compressed_media_features",
    # round 7 rewrites (distributed rank-exact quantile selection)
    "conformal_spend_interval",
    "nb_confidence_margin",
    # round 8: the remaining top-cost extras, audited
    "retrieval_model_comparison",
    "encoding_size_planning",
    "percolation_robustness",
    "bfs_hops_copurchase",
    "hilbert_layout_report",
    # round 8 anchors
    "restart_offsets_replay",
    "acl_denial_audit",
    "per_queue_watermark_skew",
]

_UNITS = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30}


def _parse_bytes(text: str) -> int:
    """'10.3 MiB' or 'total (min, med, max)\\n1101.0 B (...)' -> bytes."""
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB)", text)
    return int(float(m.group(1)) * _UNITS[m.group(2)]) if m else 0


def _sql_executions(base: str):
    with urllib.request.urlopen(f"{base}/sql?details=true&length=1000",
                                timeout=20) as r:
        return json.loads(r.read())


def main() -> None:
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.driver.memory", "48g")
        .appName("shuffle_audit")
        .getOrCreate()
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}"

    rows = []
    seen_exec_ids: set = set()
    for name in QUERIES:
        if name not in REGISTRY:
            continue
        spark.catalog.clearCache()
        REGISTRY[name].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        time.sleep(0.5)  # listener bus drain
        execs = [
            e
            for e in _sql_executions(base)
            if e.get("status") == "COMPLETED" and e["id"] not in seen_exec_ids
        ]
        scan = shuf = 0
        # a query may run helper executions (stats passes, k-means
        # steps, model collects) before the final one — charge them all
        for e in execs:
            seen_exec_ids.add(e["id"])
            for n in e.get("nodes", []):
                for met in n.get("metrics", []):
                    nm = met.get("name", "")
                    if nm == "size of files read":
                        scan += _parse_bytes(met.get("value", ""))
                    elif nm == "shuffle bytes written":
                        shuf += _parse_bytes(met.get("value", ""))
        ratio = shuf / scan if scan else float("inf")
        rows.append((name, scan, shuf, ratio))
        print(
            f"{name:32s} scan={scan / 1e6:9.2f}MB "
            f"shuf={shuf / 1e6:9.2f}MB ratio={ratio:8.4f}",
            flush=True,
        )

    out = [
        "# SHUFFLE — measured shuffle amplification (bytes shuffled per",
        "parquet byte scanned), the ratio that projects to 100 TB",
        "",
        f"Generated by tools/shuffle_audit.py at {sf} (noop sink, AQE on,",
        "32 shuffle partitions), from the Spark SQL-tab node metrics:",
        "`scan` sums every Scan node's `size of files read` across all",
        "executions a query runs (including helper passes such as stats",
        "or k-means training); `shuffle` sums every Exchange's `shuffle",
        "bytes written`. Scanned bytes scale linearly with corpus size,",
        "so a small constant ratio means the shuffle stays affordable at",
        "any scale — the dedup/sketch families shuffle keys, signatures",
        "and counters, never document text. deterministic_corpus_shuffle",
        "is the one deliberate exception: a corpus shuffle IS a full",
        "re-layout, so its ratio ~1 is the theoretical minimum, not a",
        "smell.",
        "",
        "Reading the dedup-family rows (ratios ~1-3): documents.parquet",
        "is COMPRESSED text (~4x), while their shuffles move 8-byte",
        "hashed shingle/passage keys and fixed-width signatures — per",
        "RAW corpus byte these operators shuffle well under 1 byte, and",
        "the hashed-key design is precisely what keeps that constant at",
        "100 TB (the uncompressed text never crosses the wire).",
        "knn_exact_topk's map-side local top-k cut means only ~k",
        "survivor rows per query per batch shuffle — the corpus x query",
        "grid never does.",
        "",
        "Spread rows: queries guarded by spread_for_compute (q1, the JSD",
        "trigram explode, fuzzy decontamination, ivf consumer assigns)",
        "show an extra round-robin exchange of their pruned input HERE",
        "because every fixture parquet is single-row-group (one scan",
        "task). That exchange exists ONLY on under-partitioned small",
        "inputs — at real corpus scale the input already has cluster",
        "parallelism and spread_for_compute returns it untouched, so",
        "those ratios drop back to their pre-spread values.",
        "",
        "| query | scan MB | shuffle-write MB | shuffle/scan |",
        "|---|---|---|---|",
    ]
    for name, scan, shuf, ratio in rows:
        out.append(
            f"| {name} | {scan / 1e6:.2f} | {shuf / 1e6:.2f} | {ratio:.4f} |"
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SHUFFLE.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote SHUFFLE.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
