"""Scale-curve probe: replicate the sf0.1 tables 10× with key shifting
(a synthetic ~sf1) and measure how the headline plan shapes scale.

The brief's question is not "is it fast at sf0.1" but "would the plan
survive 100 TB" — this probe supplies the measured first decade of
that curve. Replication shifts every join/group key by a disjoint
offset per copy, so group counts, join fan-outs, and dup-pair
densities scale the way real data growth would (NOT 10 identical
copies of the same keyspace, which would inflate skew):

    events:    user_id += c·10⁶,  event_id += c·10⁹
    lineitem:  l_orderkey += c·10⁹ (and orders o_orderkey likewise)
    documents: doc_id += c·10⁶ (texts unchanged — dup density scales)
    embeddings: vec_id += c·10⁶

Run:  python tools/scale_probe.py      (writes .replica/sf1x, ~200 MB)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
OUT = "/root/repo/.replica/sf1x"
COPIES = 10

SHIFTS = {
    "events": [("user_id", 1_000_000), ("event_id", 1_000_000_000)],
    "lineitem": [("l_orderkey", 1_000_000_000)],
    "orders": [("o_orderkey", 1_000_000_000), ("o_custkey", 1_000_000)],
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
}
# dims copied unshifted (joins against them must keep matching)
PLAIN = ["customer", "supplier", "part", "nation", "region"]

PROBES = [
    # (key, tables it reads — for documentation only)
    ("agg_hash", "lineitem"),
    ("join_shuffle", "orders+lineitem"),
    ("window_rank", "events"),
    ("dedup_minhash", "documents"),
    ("dedup_exact", "documents"),
    ("kmeans_fit", "embeddings"),
    ("graph_components", "documents"),
    ("window_session", "events"),
    ("decontam_ngram_overlap", "documents"),
    ("events_rfm", "events"),
    ("text_inverted_index", "documents"),
    ("dedup_line_level", "documents"),
    # round-5 extension (VERDICT r4 item 6): the remaining expensive
    # families — pagerank at data-sized rounds, banded simhash, sketch
    # percentiles, vector range search, WAV decode
    ("graph_pagerank", "lineitem+orders"),
    ("dedup_simhash", "documents"),
    ("agg_percentile_approx", "lineitem"),
    ("sim_range_search", "embeddings"),
    ("multimodal_audio_decode", "documents"),
    # round-5 new-key probes
    ("agg_ks_test", "orders"),
    ("text_perplexity_buckets", "documents"),
    ("multimodal_audio_vad", "documents"),
    ("text_bpe_pair_counts", "documents"),
    ("text_quality_logreg", "documents"),
    # round-6 extension (VERDICT r5 item 4): the expensive keys still
    # unprobed, plus a re-probe of sim_knn_graph on current code
    ("multimodal_video_framesample", "documents"),
    ("kmeans_farthest_init", "embeddings"),
    ("mining_cooccurrence", "lineitem"),
    ("sim_knn_graph", "embeddings"),
    ("streaming_session_window", "events"),
    ("sink_compaction", "orders"),
    ("join_dynamic_partition_prune", "orders"),
    # round-6 new keys
    ("text_bpe_train", "documents"),
    ("pipeline_rag", "documents"),
    ("text_quality_train", "documents"),
    ("ts_resample_ohlc", "events"),
    ("graph_label_propagation", "lineitem"),
    ("sink_zorder", "orders"),
    ("embedding_mrl_truncate", "embeddings"),
    ("text_feature_hashing", "documents"),
    ("ts_changepoint_binseg", "events"),
    ("embedding_pca_power", "embeddings"),
    ("geo_grid_knn", "embeddings"),
    ("mv_incremental_agg", "orders"),
    ("ts_seasonal_decompose", "orders"),
    ("text_kneser_ney", "documents"),
    ("text_compression_ratio", "documents"),
    ("agg_kmv_setops", "events"),
    ("graph_shortest_paths", "lineitem"),
    ("multimodal_audio_spectrogram", "documents"),
    ("table_diff", "orders"),
    ("ts_autocorrelation", "orders"),
    ("data_kanonymity", "customer"),
    # round-7 new keys
    ("sim_ann_incremental", "embeddings"),
    ("pipeline_rag_rerank", "documents"),
    # round-7 coverage sweep: the most expensive keys still unprobed
    ("tpch_q21", "lineitem+orders+supplier+nation"),
    ("tpch_q9", "lineitem+orders+part+supplier+partsupp-free"),
    ("tpch_q8", "lineitem+orders+part+customer"),
    ("window_ewma", "events"),
    ("events_pareto_share", "events"),
    ("agg_weighted_median", "lineitem"),
    ("pipeline_curation", "documents"),
    ("kmeans_assign", "embeddings"),
    ("sim_cosine_topk", "embeddings"),
    ("text_repetition", "documents"),
    ("text_bigram_lm", "documents"),
]


def _lpa_shuffle(spark, sf_dir):
    from flink_kmeans_spark.plans.analytics import graph_label_propagation

    return graph_label_propagation(spark, sf_dir, broadcast_nodes_max=0)


# Non-registry probe shapes: strategy branches a registered key can't
# reach at test scale (VERDICT r6 item 2 — the ≥10⁶-node SHUFFLE branch
# of the iterative graph family must carry a measured ratio too).
SPECIAL_PROBES = [
    ("graph_label_propagation_shuffle", "lineitem", _lpa_shuffle),
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for t, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for c in range(COPIES):
            d = src
            for col, step in shifts:
                d = d.withColumn(col, F.col(col) + F.lit(c * step))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    for t in PLAIN:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")


def main() -> None:
    from flink_kmeans_spark.plans.registry import QUERIES
    from flink_kmeans_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{OUT}/events.parquet"):
        t0 = time.time()
        build(spark)
        print(f"[build] 10x replica written in {time.time()-t0:.1f}s", file=sys.stderr)

    queries = QUERIES()
    results = {}
    # optional argv key subset: probe only the named keys (results are
    # merged into SCALE_PROBE.json by the caller)
    wanted = set(sys.argv[1:])
    avail = {k for k, _ in PROBES if k in queries and (not wanted or k in wanted)}
    runnable = [(k, t, queries[k]) for k, t in PROBES if k in avail] + [
        (k, t, fn)
        for k, t, fn in SPECIAL_PROBES
        if not wanted or k in wanted
    ]
    for key, tables, fn in runnable:
        times = {}
        for label, sf_dir in (("sf0.1", BASE), ("sf1x", OUT)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        ratio = round(times["sf1x"] / times["sf0.1"], 2)
        results[key] = {**times, "ratio_at_10x_data": ratio, "tables": tables}
        print(f"[probe] {key}: {times['sf0.1']}s -> {times['sf1x']}s "
              f"({ratio}x at 10x data)", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
