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
# stalest-latest-green-round first (computed by folding the eleven
# CORRECTNESS files; within a cohort, alphabetical). Round-12 window,
# front to back:
# + the d5-vintage tail (22 oracled keys whose latest driver hash is
#   still round 5 — they were r11's planned tail that slipped past the
#   50-key cut)
# + the d6-vintage cohort head (25 oracled keys, alphabetical; the
#   rest slips to a future window)
# + the three declared rows-only keys with r1/r2 driver evidence
#   (refresh is execution-only `no_oracle` rows)
# Ordering only; results are order-independent (re-proved by re-running
# the local plain-session gate after the reorder).
_WINDOW_PRIORITY: list[str] = [
    # --- d5-vintage tail (latest green driver row is round 5) ---
    "orders_mix_shift", "pipeline_media_curation",
    "sample_hash_stratified", "sample_stratified", "scalar_interval",
    "scalar_url", "scan_text_lines", "scd2_intervals",
    "sim_filtered_topk", "sim_knn_graph", "sink_compaction",
    "sink_parquet_codecs", "sql_pipe_syntax", "streaming_media_decode",
    "table_fingerprint", "text_bigram_lm", "text_bm25_topk",
    "text_encode_ids", "text_inverted_index", "ts_fill_forward",
    "window_ewma", "window_rolling_median",
    # --- d6-vintage head (latest green driver row is round 6) ---
    "agg_chi2_independence", "agg_kmv_distinct", "agg_kmv_setops",
    "agg_ks_test", "data_kanonymity", "dedup_line_level",
    "embedding_mrl_truncate", "embedding_pca_power",
    "events_bot_detection", "events_funnel_ttc",
    "events_markov_chain_2nd", "events_survival_curve", "geo_grid_knn",
    "graph_label_propagation", "graph_shortest_paths", "join_broadcast",
    "join_outer", "join_shuffle", "multimodal_audio_spectrogram",
    "multimodal_audio_vad", "multimodal_phash", "mv_incremental_agg",
    "pipeline_rag", "project_filter", "scan_events_ns",
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
