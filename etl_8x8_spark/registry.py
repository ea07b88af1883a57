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
# order. Round-6 priority = the 52 keys with no driver CORRECTNESS row
# across r1-r5 (union = 193 of 245 green, zero fails): the staged
# rotation remainder. The driver's 50 slots take positions 1-50;
# positions 51-52 (``quality_expectations``,
# ``stream_watermark_late_data`` — the latter rows-only by declared
# design, so a driver row adds the least evidence) roll to round 7,
# completing full 245/245 driver coverage.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    "sink_zorder_clustered",
    "scan_metadata_stats_approx",
    "scan_manifest_pruned",
    "sink_merge_upsert",
    "scan_incremental_watermark",
    "view_incremental_refresh",
    "sample_shuffle_shards",
    "sample_bootstrap_poisson",
    "sample_stratified_neyman",
    "fn_struct",
    "fn_variant",
    "fn_udtf_installments",
    "dedup_containment",
    "ml_kmeans_converged",
    "text_line_dedup",
    "stream_topk_per_window",
    "agg_mode",
    "agg_corr_matrix",
    "agg_linear_regression",
    "agg_entropy",
    "agg_markov_transitions",
    "agg_robust_mad",
    "agg_ohlc_bars",
    "agg_weighted_median",
    "agg_audience_overlap",
    "agg_ab_test_ttest",
    "agg_gini_coefficient",
    "agg_survival_curve",
    "join_asof_nearest",
    "join_interval_overlap",
    "join_null_safe",
    "join_existence_mark",
    "join_lateral_topk",
    "join_grid_proximity",
    "quality_key_skew_report",
    "cdc_apply_changes",
    "graph_triangle_count",
    "graph_degree_distribution",
    "graph_pagerank_converged",
    "ml_feature_scaling",
    "agg_decay_sum",
    "window_vwap",
    "agg_cohort_ltv",
    "agg_rfm_segments",
    "agg_abc_classification",
    "agg_conversion_latency",
    "agg_fulfillment_latency",
    "agg_new_vs_returning",
    "window_streak_detection",
    "agg_stickiness_dau_mau",
    "quality_expectations",
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
