"""Central query registry — the correctness contract with the driver.

Every SURVEY.md §2 operator key registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
DuckDB-runnable ANSI-SQL oracle string. ``__spark_entry__.py`` exposes
these verbatim as ``queries()`` / ``oracle_sql()``.

Conventions (driver compare = row count + schema + order-insensitive
value hash with columns sorted by name):

- every computed column is aliased IDENTICALLY in the DataFrame code
  and the oracle SQL;
- double aggregates are rounded (4–6 dp) on BOTH sides — Spark and
  DuckDB sum floats in different orders;
- DuckDB integer SUM returns HUGEINT and many scalar fns return BIGINT
  where Spark returns INT — oracles CAST to the Spark-side type;
- timestamps in outputs are surfaced as epoch-second BIGINTs or DATEs,
  never raw timestamps (pandas ns-vs-µs unit mismatch hazards).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None => driver runs rows-only check
    tags: tuple = field(default_factory=tuple)


_SPECS: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in _SPECS:
            raise ValueError(f"duplicate query key {name!r}")
        _SPECS[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    # Import side effects populate _SPECS; keep sorted by build phase.
    from . import kmeans_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import eventtime  # noqa: F401
    from . import llm  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import analytics  # noqa: F401
    from . import advanced  # noqa: F401


# Driver-verification window priority. The driver hashes only the FIRST
# ~50 queries() entries per round. As of round 6 EVERY oracled key has
# at least one green driver hash row (folded CORRECTNESS_r01..r06), so
# this round-7 rotation (the recipe VERDICT r6 item 1 asked for) is
# pure evidence REFRESH plus the round-7 additions: the ~2 new r7 keys
# lead (zero driver evidence), then the 31 keys whose LATEST green row
# is from round 1, then the highest-traffic round-2 keys — the flagship
# §2A K-Means path first, then the five streaming twins, then the
# remaining r2 window/relational core — filling the ~50-slot window so
# no key's latest driver evidence is older than it has to be. Declared
# rows-only keys (no_oracle in the driver) sort BELOW the oracled tail
# so they never burn a hashed window slot. Ordering only; results are
# order-independent (proved by re-running the local gate after the
# reorder).
_WINDOW_PRIORITY: list[str] = [
    # --- new in round 7 — no driver evidence yet ---
    "sim_ann_incremental", "pipeline_rag_rerank",
    # --- stalest evidence: the 31 keys whose latest driver row is r1 ---
    "agg_cube", "agg_distinct", "agg_hash", "agg_rollup_cube", "agg_stats",
    "join_asof", "join_cross", "join_null_aware_anti", "join_outer_full",
    "join_range_binned", "join_semi_anti", "join_skew_salted",
    "join_theta_range",
    "scalar_array", "scalar_case", "scalar_date", "scalar_explode",
    "scalar_json", "scalar_math", "scalar_null", "scalar_string",
    "scalar_string_extra",
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q14",
    "tpch_q17", "tpch_q18", "tpch_q19",
    # --- r2-stale refresh: flagship §2A K-Means path first (driver rows
    #     were four rounds old — VERDICT r6 asked for these explicitly) ---
    "kmeans_scan_points", "kmeans_init_centroids", "kmeans_assign",
    "kmeans_fit", "kmeans_predict", "kmeans_collection_source",
    #     the five streaming twins:
    "streaming_tumbling", "streaming_sliding", "streaming_session",
    "streaming_stateful_counter", "streaming_static_join",
    #     remaining r2 window/relational core up to the ~50-slot edge:
    "window_rank", "set_ops", "sort_limit", "dedup_exact", "udf_surface",
    "window_session", "window_sliding", "window_tumbling",
    # --- next-stalest (r2) keys, in line if the window runs wider ---
    "agg_collect", "agg_conditional", "agg_corr", "agg_minmax_by",
    "agg_percentile", "agg_pivot", "agg_string_concat",
    "dedup_edit_distance", "dedup_embedding_cosine", "dedup_ngram_jaccard",
    "multimodal_schema", "scalar_bitwise", "scalar_format", "sort_nulls",
    "sim_cosine_topk", "text_fingerprint", "text_langid", "text_ngram_freq",
    "text_pii_redact", "text_quality", "text_stats", "text_tokens",
    "text_vocab", "window_analytic", "window_distribution",
    "window_first_last", "window_frame", "window_rank_variants",
    # --- r1-green keys refreshed in the r6 window (now freshest) ---
    "scan_parquet", "scan_events_ns", "scan_json", "project_filter",
    "sink_csv", "sink_parquet", "sink_upsert",
    "join_broadcast", "join_shuffle", "join_outer",
    # --- r05-window keys, all driver-green in CORRECTNESS_r05.json ---
    "sample_hash_stratified",
    "sample_stratified", "cdc_merge_apply", "scd2_intervals",
    "ts_fill_forward", "mining_cooccurrence", "orders_backlog_curve",
    "orders_mix_shift", "forecast_snaive_backtest", "kmeans_farthest_init",
    "join_dynamic_partition_prune", "scalar_interval", "sink_compaction",
    "join_asof_tolerance", "text_bm25_topk", "decontam_ngram_overlap",
    "sim_filtered_topk", "sim_knn_graph", "multimodal_resize",
    "multimodal_audio_decode", "multimodal_video_framesample", "text_encode_ids",
    "text_inverted_index", "pipeline_media_curation", "streaming_media_decode",
    "text_bigram_lm", "events_entropy", "events_windowed_topk",
    "graph_degree_dist", "events_time_weighted_avg", "events_gap_detection",
    "events_cusum_drift", "events_ab_test", "events_next_event_baseline",
    "window_rolling_median", "scalar_url", "data_skew_report",
    "domain_mix_rebalance", "scan_text_lines", "events_outlier_mad",
    "window_ewma", "dedup_url_canonical", "sink_parquet_codecs",
    "table_fingerprint", "gdpr_user_erasure",
    "dedup_minhash", "dedup_simhash", "agg_percentile_approx",
    "join_skew_aqe", "sql_pipe_syntax",
    # --- r04-window keys, all driver-green in CORRECTNESS_r04.json
    #     (kept next so any wider-than-50 window re-confirms them) ---
    "scalar_complex", "streaming_checkpoint_resume", "streaming_foreach_batch",
    "streaming_stream_join", "streaming_dedup", "streaming_kmeans_assign",
    "window_rollup", "window_count_distinct", "window_range_interval",
    "window_ratio_to_report", "agg_histogram", "agg_grouping_sets",
    "agg_mode", "agg_bitmap_distinct", "agg_cms_frequency",
    "agg_approx_topk", "agg_salted_twophase", "agg_weighted_median",
    "reshape_unpivot", "join_asof_forward", "join_asof_nearest",
    "join_bucket_colocated", "join_bloom_pruned", "join_lateral_topn",
    "join_point_in_time", "join_interval_overlap", "text_tfidf_exact",
    "text_chunk", "text_pack", "text_repetition",
    "text_boilerplate_ngrams", "text_collocations", "text_containment",
    "text_unigram_logprob", "text_zipf_fit", "sim_range_search",
    "sim_maxsim_topk", "multimodal_decode", "multimodal_framesample",
    "multimodal_probe_formats", "multimodal_dedup_hash", "dedup_incremental",
    "dedup_threshold_histogram", "embedding_quantize_int8", "udf_arrow_optimized",
    "udtf_surface", "pipeline_curation", "data_split",
    "split_contamination", "data_quality_checks",
    # --- declared rows-only keys (driver records no_oracle; keep below
    #     the oracled tail so they never burn a hashed-window slot) ---
    "kmeans_fit_converged", "agg_hll_sketch",
    "streaming_late_data", "text_tfidf",
    "dedup_cluster_rep", "sim_ivf_topk", "sim_pq_topk",
    "sim_lsh_topk", "text_quality_train", "text_compression_ratio",
]


def specs() -> dict[str, QuerySpec]:
    _load_all()
    missing = [k for k in _WINDOW_PRIORITY if k not in _SPECS]
    if missing:
        raise KeyError(f"_WINDOW_PRIORITY names unknown keys: {missing}")
    ordered = {k: _SPECS[k] for k in _WINDOW_PRIORITY}
    ordered.update((k, s) for k, s in _SPECS.items() if k not in ordered)
    return ordered


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: s.fn for name, s in specs().items()}


def ORACLES() -> dict[str, str]:
    return {name: s.oracle for name, s in specs().items() if s.oracle is not None}


def query_names() -> list[str]:
    return sorted(specs())
