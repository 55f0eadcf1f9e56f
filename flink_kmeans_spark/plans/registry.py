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
# ~50 queries() entries per round. Rotation is pure evidence REFRESH:
# new keys with no driver evidence lead, then
# stalest-latest-green-round first (computed by folding the ten
# CORRECTNESS files; within a cohort, alphabetical). Round-11 window
# (per VERDICT r10 item 1), front to back:
#   new r11 keys (no driver evidence yet) — inserted as they land
# + the d4-vintage cohort (21 oracled keys whose latest driver hash is
#   round 4 — the stalest oracled evidence on file; they were r10's
#   planned tail that slipped when the window spent slots on the
#   one-time rows-only rotation)
# + the d5-vintage cohort (50 keys, alphabetical; the ~25 that fit the
#   window move to r11, the tail slips to r12's window)
# + the three declared rows-only keys with r1/r2 driver evidence
#   (refresh is execution-only `no_oracle` rows; oracled refresh wins
#   the contested slots)
# Ordering only; results are order-independent (re-proved by re-running
# the local gate after the reorder).
_WINDOW_PRIORITY: list[str] = [
    # --- new in round 11 — no driver evidence yet ---
    "sim_hnsw_topk",
    # --- d4-vintage (21 oracled keys; latest green driver row is round 4) ---
    "split_contamination", "streaming_checkpoint_resume",
    "streaming_dedup", "streaming_foreach_batch",
    "streaming_kmeans_assign", "streaming_stream_join",
    "text_boilerplate_ngrams", "text_chunk", "text_collocations",
    "text_containment", "text_pack", "text_repetition", "text_tfidf_exact",
    "text_unigram_logprob", "text_zipf_fit", "udf_arrow_optimized",
    "udtf_surface", "window_count_distinct", "window_range_interval",
    "window_ratio_to_report", "window_rollup",
    # --- d5-vintage (50 keys; latest green driver row is round 5) ---
    "agg_percentile_approx", "cdc_merge_apply", "data_skew_report",
    "decontam_ngram_overlap", "dedup_minhash", "dedup_simhash",
    "dedup_url_canonical", "domain_mix_rebalance", "events_ab_test",
    "events_cusum_drift", "events_entropy", "events_gap_detection",
    "events_next_event_baseline", "events_outlier_mad",
    "events_time_weighted_avg", "events_windowed_topk",
    "forecast_snaive_backtest", "gdpr_user_erasure", "graph_degree_dist",
    "join_asof_tolerance", "join_dynamic_partition_prune", "join_skew_aqe",
    "kmeans_farthest_init", "mining_cooccurrence",
    "multimodal_audio_decode", "multimodal_resize",
    "multimodal_video_framesample", "orders_backlog_curve",
    "orders_mix_shift", "pipeline_media_curation",
    "sample_hash_stratified", "sample_stratified", "scalar_interval",
    "scalar_url", "scan_text_lines", "scd2_intervals", "sim_filtered_topk",
    "sim_knn_graph", "sink_compaction", "sink_parquet_codecs",
    "sql_pipe_syntax", "streaming_media_decode", "table_fingerprint",
    "text_bigram_lm", "text_bm25_topk", "text_encode_ids",
    "text_inverted_index", "ts_fill_forward", "window_ewma",
    "window_rolling_median",
    # --- declared rows-only keys with r1/r2 driver evidence ---
    "agg_approx", "kmeans_datagen", "kmeans_mllib",
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
