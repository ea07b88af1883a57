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
# order. Round-12 priority (r11 verdict item 4 + the r12 changes),
# filling exactly the 50-slot window as 10 + 3 + 9 + 6 + 22:
#   0. the 10 r12-wave-2/3/4/5 keys (newest — no driver evidence yet);
#   1. the 3 r12-wave-1 keys (no driver evidence yet);
#   2. the 9 keys whose implementation changed in r12 (theil_sen
#      histogram-prune rework, cdc_stream_apply txn-log rebase,
#      agg_mutual_information/fn_net parity fixes, graph_k_core
#      cache fix, the 3 mtime-keyed scratch ops, and
#      window_mann_kendall so its HEADLINE promotion lands with a
#      fresh correctness row);
#   3. the 6 r5-vintage leftovers (the oldest evidence anywhere);
#   4. the first 22 (alphabetical) of the 47-key r6 cohort — the
#      remaining 25 (graph_degree_distribution and
#      graph_pagerank_converged have their own bench rows every
#      round; graph_triangle_count, join_asof_nearest,
#      join_existence_mark,
#      join_grid_proximity, join_interval_overlap, join_lateral_topk,
#      join_null_safe, ml_feature_scaling, then
#      ml_kmeans_converged .. window_vwap) roll to r13.
# Target: after the r12 driver run no key's evidence is older than r6,
# and the r6 tail is 25 keys. bench.py's HEADLINE order is independent
# and unaffected.
_SAMPLE_PRIORITY = [
    # new in r12 waves 2-5 — no driver evidence yet
    "multimodal_phash_dedup",
    "ml_ridge_closed_form",
    "pipeline_quality_gate",
    "fn_geo",
    "agg_haar_wavelet",
    "ml_logistic_regression_gd",
    "ml_pca_power_iteration",
    "quality_calibration_bins",
    "graph_bfs_layers",
    "embed_jl_project",
    # new in r12 wave 1 — no driver evidence yet
    "text_quality_classifier",
    "text_bpe_token_count",
    "scan_txn_log_time_travel",
    # implementation changed in r12 — previous rows are stale evidence
    "window_theil_sen",
    "window_mann_kendall",
    "cdc_stream_apply",
    "agg_mutual_information",
    "fn_net",
    "graph_k_core",
    "scan_csv_quarantine",
    "sink_manifest_stats",
    "sink_txn_log_commit",
    # r5-vintage evidence (the last 6; after this round r5 tail = 0)
    "window_pct_change",
    "window_rank_change",
    "window_rolling_corr",
    "window_rsi",
    "window_seasonal_decompose",
    "window_time_weighted_avg",
    # r6-vintage cohort, first 22 of 47 alphabetically (window cap)
    "agg_ab_test_ttest",
    "agg_audience_overlap",
    "agg_cohort_ltv",
    "agg_conversion_latency",
    "agg_corr_matrix",
    "agg_decay_sum",
    "agg_entropy",
    "agg_fulfillment_latency",
    "agg_linear_regression",
    "agg_markov_transitions",
    "agg_mode",
    "agg_new_vs_returning",
    "agg_ohlc_bars",
    "agg_robust_mad",
    "agg_stickiness_dau_mau",
    "agg_survival_curve",
    "agg_weighted_median",
    "cdc_apply_changes",
    "dedup_containment",
    "fn_struct",
    "fn_udtf_installments",
    "fn_variant",
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
