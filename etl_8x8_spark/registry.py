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
# order. Round-9 priority (r8 verdict item 1): driver coverage is
# literal 261/261 with zero fails, so the rotation is pure
# STALEST-FIRST — any r9-new keys (never driver-sampled) lead, then the
# 16 keys whose latest green row is r3-vintage, then the oldest
# r4-vintage keys (alphabetical within a round) to fill the 50-slot
# window. Target: after the r9 driver run no key's latest CORRECTNESS
# row is older than r4, and most of the r4 block is refreshed too.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r9 — no driver evidence yet
    "dedup_url_canonical",
    "dedup_substring_span",
    "dedup_substring_scrub",
    "dedup_incremental_minhash",
    "sim_search_pq_adc",
    "window_holt_forecast",
    "stream_session_window_state",
    # r3-vintage evidence (stalest surviving driver rows)
    "sink_sorted_clustered",
    "sort_limit_topk",
    "sql_tpch_q10_shape",
    "sql_tpch_q18_shape",
    "sql_tpch_q3_shape",
    "sql_tpch_q5_shape",
    "sql_tpch_q7_shape",
    "window_anomaly_zscore",
    "window_cumulative_users",
    "window_first_last",
    "window_gap_islands",
    "window_rank_topn_per_group",
    "window_rolling_median",
    "window_running_sum",
    "window_scd2_build",
    "window_trailing_range",
    # r4-vintage evidence (oldest 31 of 49, alphabetical)
    "agg_approx_distinct",
    "agg_hll_merge",
    "agg_partial_reaggregate",
    "agg_psi_drift",
    "agg_quantile_sketch",
    "agg_timeseries_gapfill",
    "cdc_snapshot_diff",
    "dedup_binary_exact",
    "dedup_cluster_cc",
    "dedup_embed_cosine",
    "dedup_ngram_jaccard",
    "embed_normalize_quantize",
    "graph_pagerank_iter",
    "join_bloom_pruned",
    "ml_kmeans_lloyd",
    "multimodal_binary_ingest",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_struct",
    "pipeline_pretrain_corpus",
    "pipeline_training_data",
    "sim_knn_join",
    "sim_search_ivf_topk",
    "sim_search_range",
    "sim_search_topk",
    "stream_custom_source",
    "stream_dedup_state",
    "stream_events",
    "stream_foreach_batch_upsert",
    "stream_join_interval",
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
