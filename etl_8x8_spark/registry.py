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
    "etl_8x8_spark.operators.features",
]

# ORDER MATTERS for driver sampling: the driver evaluates only the first
# 50 keys of ``all_queries()`` per round. Keys listed here lead the
# returned dict (in this order); all other keys follow in registration
# order. Round-10 priority (r9 verdict item 2): coverage is literal
# 268/268 with zero fails, so the rotation stays pure STALEST-FIRST —
# any r10-new keys (never driver-sampled) lead, then the 22 keys whose
# latest green row is r4-vintage (streaming/text/window keys with
# shared-helper churn since r4), then the oldest r5-vintage keys
# (alphabetical, 18 of 49) to fill the 50-slot window. Target: after the r10
# driver run no key's latest CORRECTNESS row is older than r5.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r10 — no driver evidence yet
    "stream_session_window_tws",
    "stream_join_outer",
    "sim_search_ivfpq_topk",
    "window_mann_kendall",
    "sample_weighted_poisson",
    "window_holt_winters",
    "stream_tws_ttl_cache",
    "scan_parquet_bloom",
    "cdc_stream_apply",
    "graph_label_propagation",
    # r4-vintage evidence (stalest surviving driver rows, all 22)
    "stream_dedup_state",
    "stream_events",
    "stream_foreach_batch_upsert",
    "stream_join_interval",
    "stream_session_window",
    "stream_sliding_agg",
    "stream_state_ttl_cache",
    "stream_tumbling_agg",
    "text_analysis_stats",
    "text_contamination_check",
    "text_doc_chunking",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_counts",
    "text_pii_redact",
    "text_repetition_filter",
    "text_tfidf_terms",
    "text_token_budget_pack",
    "text_unigram_logprob",
    "window_dedup_latest",
    "window_lag_lead",
    "window_sessionize",
    # r5-vintage evidence (oldest 27 of 49, alphabetical)
    "agg_basket_affinity",
    "agg_benford_digit",
    "agg_bounce_rate",
    "agg_chi_square",
    "agg_count_min_sketch",
    "dedup_minhash_near",
    "dedup_simhash",
    "graph_common_neighbors",
    "join_feature_store_pit",
    "ml_naive_bayes",
    "pipeline_feature_dataset",
    "quality_referential_integrity",
    "scan_metadata_stats",
    "sim_search_lsh_topk",
    "sink_compaction",
    "sql_tpch_q11_shape",
    "sql_tpch_q12_shape",
    "sql_tpch_q13_shape",
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
