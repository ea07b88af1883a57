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
# order. Round-5 priority = 50 of the 78 keys with no green driver
# hash row yet (r1-r4 CORRECTNESS union = 144 of 221 keys): the 17
# unsampled TPC-H shapes, the 22 analytics-extras wave, the 8 unsampled
# SURVEY window keys, and the 3 LSH-family keys that gained exact
# portable-hash oracles this round (dedup_minhash_near was sampled r4
# but as rows-only `no_oracle`; re-sampling converts it to hash-green).
# The remaining 28 never-sampled keys rotate in next round.
# bench.py's HEADLINE order is independent (append-only) and unaffected.
_SAMPLE_PRIORITY = [
    # --- LSH family, exact oracles new this round ---
    "dedup_minhash_near",
    "dedup_simhash",
    "sim_search_lsh_topk",
    # --- 17 TPC-H shapes, never driver-sampled ---
    "sql_tpch_q1_shape",
    "sql_tpch_q2_shape",
    "sql_tpch_q4_shape",
    "sql_tpch_q6_shape",
    "sql_tpch_q8_shape",
    "sql_tpch_q9_shape",
    "sql_tpch_q11_shape",
    "sql_tpch_q12_shape",
    "sql_tpch_q13_shape",
    "sql_tpch_q14_shape",
    "sql_tpch_q15_shape",
    "sql_tpch_q16_shape",
    "sql_tpch_q17_shape",
    "sql_tpch_q19_shape",
    "sql_tpch_q20_shape",
    "sql_tpch_q21_shape",
    "sql_tpch_q22_shape",
    # --- 22 analytics extras, never driver-sampled ---
    "agg_basket_affinity",
    "agg_benford_digit",
    "agg_bounce_rate",
    "agg_chi_square",
    "agg_count_min_sketch",
    "agg_lorenz_curve",
    "graph_common_neighbors",
    "join_feature_store_pit",
    "ml_naive_bayes",
    "pipeline_feature_dataset",
    "quality_referential_integrity",
    "scan_metadata_stats",
    "sink_compaction",
    "text_bigram_perplexity",
    "text_bm25_rank",
    "text_pmi_cooccur",
    "text_zipf_fit",
    "window_bollinger_bands",
    "window_cusum_detect",
    "window_rolling_corr",
    "window_rsi",
    "window_seasonal_decompose",
    # --- 8 remaining SURVEY window keys, never driver-sampled ---
    "window_ewma_smooth",
    "window_pct_change",
    "window_attribution_last_touch",
    "window_time_weighted_avg",
    "window_forward_fill",
    "window_linear_interpolate",
    "window_rank_change",
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
