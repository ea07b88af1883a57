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
# order. Round-13 priority (r12 verdict item 5 + the r13 changes),
# filling exactly the 50-slot window as 6 + 7 + 24 + 13:
#   0. the 6 r13-new keys (sink_txn_log_merge,
#      dedup_incremental_substring, scan_txn_log_checkpoint,
#      sink_txn_log_vacuum, multimodal_resize, scan_xml — no driver
#      evidence yet);
#   1. the 7 keys whose implementation changed in r13
#      (embed_jl_project scalar output, multimodal_phash_dedup
#      repeat-to-width payload, fn_installments_codegen /
#      fn_udtf_installments terminal-sort drops,
#      graph_pagerank_converged degree fold, agg_corr_matrix +
#      agg_linear_regression quantized-integer power sums);
#   2. the full 25-key r6-vintage cohort (pagerank is r6-vintage too
#      but rides slot 1) — after r13 the r6 tail is ZERO;
#   3. the first 13 (alphabetical) of the 49-key r7 cohort
#      (fn_installments_codegen is r7-vintage and rides slot 1; the
#      remaining 35 r7 keys roll to r14).
# Target: after the r13 driver run no key's evidence is older than r7.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r13 — no driver evidence yet
    "sink_txn_log_merge",
    "dedup_incremental_substring",
    "scan_txn_log_checkpoint",
    "sink_txn_log_vacuum",
    "multimodal_resize",
    "scan_xml",
    # implementation changed in r13 — previous rows are stale evidence
    "embed_jl_project",
    "multimodal_phash_dedup",
    "fn_installments_codegen",
    "fn_udtf_installments",
    "graph_pagerank_converged",
    "agg_corr_matrix",
    "agg_linear_regression",
    # r6-vintage cohort, complete (24 + pagerank above)
    "graph_degree_distribution",
    "graph_triangle_count",
    "join_asof_nearest",
    "join_existence_mark",
    "join_grid_proximity",
    "join_interval_overlap",
    "join_lateral_topk",
    "join_null_safe",
    "ml_feature_scaling",
    "ml_kmeans_converged",
    "quality_key_skew_report",
    "sample_bootstrap_poisson",
    "sample_shuffle_shards",
    "sample_stratified_neyman",
    "scan_incremental_watermark",
    "scan_manifest_pruned",
    "scan_metadata_stats_approx",
    "sink_merge_upsert",
    "sink_zorder_clustered",
    "stream_topk_per_window",
    "text_line_dedup",
    "view_incremental_refresh",
    "window_streak_detection",
    "window_vwap",
    # r7-vintage cohort, first 13 of 49 alphabetically (window cap)
    "agg_abc_classification",
    "agg_bitmap_distinct",
    "agg_count_if",
    "agg_cube",
    "agg_distinct_count",
    "agg_gini_coefficient",
    "agg_grouping_sets",
    "agg_hash_group",
    "agg_hdr_histogram_pctl",
    "agg_heavy_hitters",
    "agg_histogram",
    "agg_lorenz_curve",
    "agg_map_collect",
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
