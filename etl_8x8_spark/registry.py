"""Query registry — the driver contract's backbone.

Every operator from SURVEY.md §2b registers here as
``name -> (builder, oracle_sql | None)``. ``__spark_entry__.queries()``
and ``oracle_sql()`` are thin views over this dict, and the local
parity harness (tools/verify_queries.py) iterates it directly.

A builder is ``(spark, sf_dir) -> DataFrame``; the oracle is ANSI SQL
DuckDB runs against the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings).
Builders alias every computed column to match the oracle exactly —
the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryBuilder
    oracle: str | None  # None => driver runs the weaker rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import; one per §2b family.
# Module order no longer controls driver sampling — _SAMPLE_PRIORITY
# below does, per-key.
_QUERY_MODULES = [
    "etl_8x8_spark.sources.scans",
    "etl_8x8_spark.operators.windows",
    "etl_8x8_spark.operators.setops",
    "etl_8x8_spark.operators.scalar_fns",
    "etl_8x8_spark.operators.sql_queries",
    "etl_8x8_spark.operators.dedup",
    "etl_8x8_spark.operators.similarity",
    "etl_8x8_spark.operators.text",
    "etl_8x8_spark.operators.multimodal",
    "etl_8x8_spark.streaming.streams",
    "etl_8x8_spark.operators.aggregates",
    "etl_8x8_spark.operators.record_ops",
    "etl_8x8_spark.operators.joins",
    "etl_8x8_spark.operators.cdc",
    "etl_8x8_spark.operators.graph",
]

# ORDER MATTERS for driver sampling: the driver evaluates only the first
# 50 keys of ``all_queries()`` per round. Keys listed here lead the
# returned dict (in this order); all other keys follow in registration
# order. Round-4 priority = the 53 keys with no green driver row yet:
# 47 never-sampled (all dedup/similarity/text/multimodal/streaming +
# gapfill/psi/partial-reagg/bloom/cdc/graph), the 3 sketch aggregates
# that erred in r1/r2 (deterministic oracles added post-r2), and the 3
# windows that failed r3 on the TIMESTAMP_NTZ read (fixed in
# sources/readers.py). The four rows-only-by-design keys sit at
# positions 50-53 so every hash-checkable key lands inside the window.
# bench.py's HEADLINE order is independent (append-only) and unaffected.
_SAMPLE_PRIORITY = [
    # --- NTZ windows, failed r3, fixed this round ---
    "window_lag_lead",
    "window_sessionize",
    "window_dedup_latest",
    # --- sketch aggregates, erred r1/r2, oracles repaired post-r2 ---
    "agg_approx_distinct",
    "agg_quantile_sketch",
    "agg_hll_merge",
    # --- never-sampled, hash-checkable ---
    "dedup_ngram_jaccard",
    "dedup_embed_cosine",
    "dedup_cluster_cc",
    "dedup_binary_exact",
    "pipeline_training_data",
    "sim_search_topk",
    "sim_search_ivf_topk",
    "sim_knn_join",
    "sim_search_range",
    "ml_kmeans_lloyd",
    "embed_normalize_quantize",
    "text_analysis_stats",
    "text_lang_id",
    "text_tfidf_terms",
    "text_fingerprint",
    "text_ngram_counts",
    "text_contamination_check",
    "text_token_budget_pack",
    "text_pii_redact",
    "text_unigram_logprob",
    "pipeline_pretrain_corpus",
    "text_doc_chunking",
    "text_repetition_filter",
    "multimodal_struct",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_features",
    "multimodal_binary_ingest",
    "stream_events",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_state",
    "stream_state_ttl_cache",
    "stream_join_interval",
    "stream_foreach_batch_upsert",
    "stream_custom_source",
    "agg_timeseries_gapfill",
    "agg_psi_drift",
    "agg_partial_reaggregate",
    "join_bloom_pruned",
    "cdc_snapshot_diff",
    "graph_pagerank_iter",
    # --- never-sampled, rows-only by design (weaker driver check) ---
    "dedup_minhash_near",
    "dedup_simhash",
    "sim_search_lsh_topk",
    "stream_watermark_late_data",
]


def register(
    name: str, oracle: str | None = None
) -> Callable[[QueryBuilder], QueryBuilder]:
    """Decorator: register a query builder under its §2b key."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in _SAMPLE_PRIORITY:
        ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
