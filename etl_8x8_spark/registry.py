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
# order. Round-11 priority (r10 verdict item 4 + the r11 additions):
# the 22 r11-new keys lead (never driver-sampled), then the two r11
# HEADLINE promotions (so their new bench rows and a fresh correctness
# row land together), then stream_watermark_late_data (oracle added in
# r11 — first hash row pending), then the entire r5-vintage cohort
# (28 of its 31 keys — the last 3 and the r6 cohort roll to r12).
# Target: after the r11 driver run every r11 key has a first hash row
# and no sampled key's latest row is older than r5.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r11 — no driver evidence yet
    "pipeline_corpus_mix",
    "sample_weighted_topk",
    "ml_gbm_boost_rounds",
    "sim_search_hamming_topk",
    "window_theil_sen",
    "text_ccnet_buckets",
    "quality_freshness",
    "sink_txn_log_commit",
    "ml_knn_classifier",
    "window_autocorr",
    "agg_top_paths",
    "fn_net",
    "sink_manifest_stats",
    "text_textrank_keywords",
    "graph_k_core",
    "graph_adamic_adar",
    "text_importance_resample",
    "sample_dedup_weights",
    "ml_decision_stump",
    "quality_anomaly_iqr",
    "agg_mutual_information",
    "scan_csv_quarantine",
    # promoted into HEADLINE this round (r10 verdict item 1) — lead so
    # their bench rows and correctness rows land in the same round
    "sim_search_ivfpq_topk",
    "graph_label_propagation",
    # oracle added in r11 (was the last rows-only key) — needs its first
    # hash-green driver row
    "stream_watermark_late_data",
    # r5-vintage evidence (oldest 25 of 31; the last 6 + all r6 roll to r12)
    "sql_tpch_q14_shape",
    "sql_tpch_q15_shape",
    "sql_tpch_q16_shape",
    "sql_tpch_q17_shape",
    "sql_tpch_q19_shape",
    "sql_tpch_q1_shape",
    "sql_tpch_q20_shape",
    "sql_tpch_q21_shape",
    "sql_tpch_q22_shape",
    "sql_tpch_q2_shape",
    "sql_tpch_q4_shape",
    "sql_tpch_q6_shape",
    "sql_tpch_q8_shape",
    "sql_tpch_q9_shape",
    "text_bigram_perplexity",
    "text_bm25_rank",
    "text_pmi_cooccur",
    "text_zipf_fit",
    "window_attribution_last_touch",
    "window_bollinger_bands",
    "window_cusum_detect",
    "window_ewma_smooth",
    "window_forward_fill",
    "window_linear_interpolate",
    "window_max_drawdown",
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
