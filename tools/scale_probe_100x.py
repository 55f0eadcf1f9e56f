"""Second-decade scale probe (VERDICT r5 item 5, extended r7): push
selected keys to 100× the sf0.1 data volume and record whether the
curve is the expected linear shuffle growth or a knee. Round 6 ran
join_shuffle / window_session; round 7 adds the two >2× 10×-ratios
(mining_cooccurrence, streaming_session_window — VERDICT r6 item 3)
plus the flagship kmeans_fit and the dedup family (documents and
embeddings now replicate too).

Replication follows tools/scale_probe.py's key-shifting rule (disjoint
key ranges per copy so group counts and join fan-outs scale the way
real growth would), at COPIES=100:

    events:   user_id += c·10⁶, event_id += c·10⁹
    orders:   o_orderkey += c·10⁹, o_custkey += c·10⁶
    lineitem: l_orderkey += c·10⁹

Interpretation: at 10× both keys sat in the scheduling-floor flat
region (wall barely moves). At 100× the data outgrows the floor, so
the honest linearity check is wall(100×)/wall(10×) ≤ ~10 with no
superlinear residue.

Run:  python tools/scale_probe_100x.py   (writes .replica/sf10x, ~1.5 GB)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
OUT10 = "/root/repo/.replica/sf1x"
OUT100 = "/root/repo/.replica/sf10x"
COPIES = 100

SHIFTS = {
    "events": [("user_id", 1_000_000), ("event_id", 1_000_000_000)],
    "lineitem": [("l_orderkey", 1_000_000_000)],
    "orders": [("o_orderkey", 1_000_000_000), ("o_custkey", 1_000_000)],
    # round-7: second-decade evidence for the flagship K-Means and the
    # dedup family too (texts unchanged — dup density scales like real
    # growth; embeddings replicate with shifted ids)
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
}

# dims copied unshifted (joins against them must keep matching)
PLAIN = ["customer", "supplier", "part", "nation", "region"]

PROBES = [
    ("join_shuffle", "orders+lineitem"),
    ("window_session", "events"),
    # round-7 (VERDICT r6 item 3): the two >2× ratios from the 10× sweep
    ("mining_cooccurrence", "lineitem"),
    ("streaming_session_window", "events"),
    # round-7 breadth: flagship K-Means fit and the dedup family at 100×
    ("kmeans_fit", "embeddings"),
    ("dedup_minhash", "documents"),
    ("dedup_exact", "documents"),
    ("dedup_simhash", "documents"),
    ("graph_pagerank", "lineitem+orders"),
    # round-7 breadth 2: the LLM serving/cleaning stack at 100×
    ("decontam_ngram_overlap", "documents"),
    ("text_inverted_index", "documents"),
    ("pipeline_rag", "documents"),
    ("pipeline_rag_rerank", "documents"),
    ("sim_ann_incremental", "embeddings"),
    ("dedup_ngram_jaccard", "documents"),
    # round-7 breadth 3: the multimodal family at 100×
    ("multimodal_audio_decode", "documents"),
    ("multimodal_phash", "documents"),
    ("pipeline_media_curation", "documents"),
    # round-7 breadth 4: dedup clustering end-to-end + tokenizer/retrieval
    ("graph_components", "documents"),
    ("text_bpe_train", "documents"),
    ("text_bm25_topk", "documents"),
    ("text_feature_hashing", "documents"),
    # round-8 (VERDICT r7 items 2/9): >1.5×-at-10× stragglers and the
    # asof-join family's first second-decade measurement
    ("tpch_q21", "lineitem+orders"),
    ("tpch_q9", "lineitem+orders"),
    ("text_repetition", "documents"),
    ("graph_label_propagation", "lineitem"),
    ("join_asof", "events"),
    ("join_asof_tolerance", "events"),
    # round-8 breadth: heavy/rewritten keys without second-decade evidence
    ("agg_weighted_median", "lineitem"),
    ("events_session_metrics", "events"),
    ("window_rolling_median", "events"),
    ("graph_shortest_paths", "lineitem"),
    ("graph_triangles", "documents"),
    ("text_bpe_pair_counts", "documents"),
    ("multimodal_audio_spectrogram", "documents"),
    ("window_rollup", "events"),
    ("events_funnel", "events"),
    ("streaming_tumbling", "events"),
    # round-8 new keys at 100×
    ("dedup_minhash_incremental", "documents"),
    ("streaming_ann_probe", "embeddings"),
    # round-8 second sweep: every remaining shape >1.15× at 10× that
    # lacked second-decade evidence (corridors sim_knn_graph /
    # agg_percentile_approx stay declared-quadratic, probed at 10× only)
    ("text_quality_train", "documents"),
    ("ts_changepoint_binseg", "events"),
    ("dedup_line_level", "documents"),
    ("sink_compaction", "lineitem"),
    ("multimodal_video_framesample", "documents"),
    ("text_compression_ratio", "documents"),
    ("text_perplexity_buckets", "documents"),
    ("text_kneser_ney", "documents"),
    ("embedding_mrl_truncate", "embeddings"),
    ("geo_grid_knn", "events"),
    ("sink_zorder", "lineitem"),
    ("text_quality_logreg", "documents"),
    ("text_bigram_lm", "documents"),
    ("window_ewma", "events"),
    ("multimodal_audio_vad", "documents"),
    ("agg_kmv_setops", "orders"),
    # round-8.5 new keys at 100×
    ("dedup_substring_span", "documents"),
    ("streaming_minhash_dedup", "documents"),
    ("search_hybrid_rrf", "documents"),
    ("dedup_substring_cut", "documents"),
    ("dedup_semantic_kmeans", "embeddings"),
    # the LPA shuffle branch never triggers organically on the replica
    # (part node-ids are unshifted, so |V| stays under the broadcast
    # bound at any COPIES) — force the dispatch to measure the branch a
    # ≥10⁶-node graph would run
    ("graph_label_propagation_shuffle", "lineitem"),
    ("kmeans_parallel_init", "embeddings"),
    ("data_dsir_select", "documents"),
    ("data_epoch_shuffle", "documents"),
    ("streaming_cdc_apply", "orders"),
    ("sim_hard_negatives", "embeddings"),
    ("agg_heavy_hitters_mg", "events"),
    # pareto_skyline reads only the unreplicated part dim — its scale
    # pattern (two-phase bucket-prefix window) is probed via
    # agg_weighted_median; a replica probe would re-read identical data
    # multimodal_phash_dedup is deliberately unprobed: the fixture
    # image space has only 36608 distinct images, so the 100x replica
    # gives every image ~137 byte-identical copies and the DOC-GRAIN
    # PAIR OUTPUT itself is Θ(copies²) (~10^10 rows) — a fixture
    # artifact, not a plan defect; the banded join runs at collapsed
    # distinct-hash grain, the shape dedup_simhash probes linear
    # round-8.5 completeness: every remaining probed shape gets
    # second-decade evidence except the two declared exact-verification
    # corridors (sim_knn_graph Θ(N²), agg_percentile_approx — their
    # scale paths are the ANN family and the sketch respectively)
    ("multimodal_audio_vad", "documents"),
    ("agg_kmv_setops", "orders"),
    ("text_bigram_lm", "documents"),
    ("window_ewma", "events"),
    ("events_pareto_share", "events"),
    ("pipeline_curation", "documents"),
    ("ts_resample_ohlc", "events"),
    ("kmeans_assign", "embeddings"),
    ("mv_incremental_agg", "orders"),
    ("join_dynamic_partition_prune", "orders+lineitem"),
    ("window_rank", "lineitem"),
    ("sim_cosine_topk", "embeddings"),
    ("sim_range_search", "embeddings"),
    ("data_kanonymity", "orders+customer"),
    ("embedding_pca_power", "embeddings"),
    ("tpch_q8", "lineitem+orders"),
    ("agg_ks_test", "events"),
    ("events_rfm", "events"),
    ("table_diff", "orders"),
    ("ts_seasonal_decompose", "events"),
    ("ts_autocorrelation", "events"),
    ("kmeans_farthest_init", "embeddings"),
    ("agg_hash", "lineitem"),
    # r9: phash banded join at 100× over fresh images (see pseudo-key)
    ("multimodal_phash_dedup_fresh", "documents"),
    # r9 new keys at 100×
    ("data_sequence_pack", "documents"),
    ("dedup_minhash_compact", "documents"),
    ("dedup_bloom_prefilter", "documents"),
    ("data_temperature_mix", "documents"),
    ("ts_holt_linear", "events"),
    ("sample_coreset_kmeans", "embeddings"),
    ("agg_ttest_welch", "events"),
    # r10 (VERDICT r9 item 2): the one registered key that had no probe
    # entry — expect flat (one hash agg + |groups|-row noise math)
    ("agg_dp_laplace", "documents"),
    # r10 new keys
    ("agg_quantile_sketch", "lineitem"),
    ("dedup_cdc_chunks", "documents"),
    ("graph_kcore", "lineitem"),
    ("streaming_quantile_sketch", "lineitem"),
    ("dedup_cdc_incremental", "documents"),
    ("sample_weighted_reservoir", "documents"),
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT100, exist_ok=True)
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
        out.write.mode("overwrite").parquet(f"{OUT100}/{t}.parquet")
    for t in PLAIN:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT100}/{t}.parquet")


def main() -> None:
    from flink_kmeans_spark.plans.registry import QUERIES
    from flink_kmeans_spark.session import get_spark

    spark = get_spark("scale-probe-100x")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{OUT100}/region.parquet"):  # last table written
        t0 = time.time()
        build(spark)
        print(f"[build] 100x replica written in {time.time()-t0:.1f}s",
              file=sys.stderr)

    queries = QUERIES()
    # pseudo-keys: registry callables with a forced strategy knob
    from flink_kmeans_spark.plans.analytics import graph_label_propagation

    queries["graph_label_propagation_shuffle"] = (
        lambda s, d: graph_label_propagation(s, d, broadcast_nodes_max=0)
    )
    # r9 (VERDICT r8 item 6): probe the phash banded join with FRESH
    # synthetic images (xxhash64-mixed synthesis ids → ~|docs| distinct
    # images) so the pair output stays bounded at 100× instead of the
    # fixture-saturation Θ(copies²) artifact
    from flink_kmeans_spark.plans.llm import multimodal_phash_dedup

    queries["multimodal_phash_dedup_fresh"] = (
        lambda s, d: multimodal_phash_dedup(s, d, fresh_pixels=True)
    )
    results = {}
    dirs = [("sf0.1", BASE), ("sf10x", OUT100)]
    if os.path.exists(f"{OUT10}/events.parquet"):
        dirs.insert(1, ("sf1x", OUT10))
    wanted = set(sys.argv[1:])
    for key, tables in PROBES:
        if wanted and key not in wanted:
            continue
        times = {}
        phase_by_label = {}
        for label, sf_dir in dirs:
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                queries[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
            from flink_kmeans_spark.session import PHASE_WALLS

            if key in PHASE_WALLS:
                phase_by_label[label] = dict(PHASE_WALLS[key])
        entry = {**times, "tables": tables,
                 "ratio_at_100x_data": round(times["sf10x"] / times["sf0.1"], 2)}
        if "sf1x" in times:
            entry["decade2_ratio"] = round(times["sf10x"] / times["sf1x"], 2)
        # Streaming keys self-report scaffold (landing build — test
        # plumbing) vs drain (the operator) walls per run; record the
        # LAST run's split per corpus label plus a drain-only decade-2
        # ratio so the grade excludes coalesce(1) scaffolding
        # (VERDICT r8 item 3). phase_by_label captured per corpus in
        # the timing loop above via session.PHASE_WALLS.
        from flink_kmeans_spark.session import PHASE_WALLS

        if key in PHASE_WALLS:
            entry["phases_last_run"] = dict(phase_by_label)
            if "sf1x" in phase_by_label and "sf10x" in phase_by_label:
                d1 = phase_by_label["sf1x"]["drain_s"]
                d2 = phase_by_label["sf10x"]["drain_s"]
                if d1 > 0:
                    entry["drain_decade2_ratio"] = round(d2 / d1, 2)
        results[key] = entry
        print(f"[probe] {key}: {times}", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
