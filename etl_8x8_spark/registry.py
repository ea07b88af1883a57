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
# order. Round-7 priority: positions 1-5 are the five keys with NO
# driver CORRECTNESS row across r1-r6 (the two r6 stowaway operators,
# the codegen twin, and the two keys that rolled off round 6's 52-key
# list) -- landing these completes literal full-registry driver
# coverage. Next come the keys round 7 changed or added (the five
# histogram-prune rewrites and the new operators — fresh code paths
# need fresh driver evidence). The remainder backfills the STALEST
# evidence: keys whose latest green row is round 2 (every other key
# has an r3+ row).
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    "agg_hdr_histogram_pctl",
    "sql_recursive_hierarchy",
    "fn_installments_codegen",
    "quality_expectations",
    "stream_watermark_late_data",
    "agg_gini_coefficient",
    "agg_lorenz_curve",
    "agg_rfm_segments",
    "agg_abc_classification",
    "window_ntile_percentile",
    "agg_stickiness_dau_mau_approx",
    "agg_hash_group",
    "agg_distinct_count",
    "agg_rollup",
    "agg_cube",
    "agg_map_collect",
    "join_broadcast_lookup",
    "join_hash_equi",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_range_theta",
    "join_asof_event",
    "join_salted_skew",
    "observe_metrics",
    "agg_pivot",
    "agg_grouping_sets",
    "agg_bitmap_distinct",
    "agg_heavy_hitters",
    "agg_window_funnel",
    "agg_stats_moments",
    "agg_retention_cohorts",
    "agg_histogram",
    "agg_count_if",
    "agg_rolling_actives",
    "agg_unpivot",
    "agg_percentile_exact",
    "agg_string_agg",
    "agg_min_max_by",
    "qs_extract",
    "filter_required",
    "validate_numeric_reject",
    "greeting_transform",
    "json_body_parse",
    "json_serialize",
    "error_route",
    "bearer_extract",
    "arn_parse",
    "policy_build",
    "jwt_verify",
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
