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
# order. Round-14 priority (r13 verdict item 2 + the r14 changes),
# filling exactly the 50-slot window as 6 + 4 + 35 + 5:
#   0. the 6 r14-new keys (sink_txn_log_conflict,
#      sink_txn_log_schema_evolution, stream_txn_log_tail,
#      scan_txn_log_cdf, sink_txn_log_restore, scan_txn_log_as_of_ts
#      — no driver evidence yet);
#   1. the 4 keys whose implementation/oracle changed in r14
#      (multimodal_resize byte-based oracle, scan_xml fixture
#      escaping, dedup_incremental_substring negated batch namespace,
#      graph_pagerank_converged gated broadcast) — their r13 rows are
#      stale evidence;
#   2. the full 35-key r7-vintage cohort (the oldest evidence after
#      the r13 rotation retired r6);
#   3. the first 5 (alphabetical) of the 50-key r8 cohort.
# Target: after the r14 driver run no key's evidence is older than r8.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r14 — no driver evidence yet
    "sink_txn_log_conflict",
    "sink_txn_log_schema_evolution",
    "stream_txn_log_tail",
    "scan_txn_log_cdf",
    "sink_txn_log_restore",
    "scan_txn_log_as_of_ts",
    # implementation/oracle changed in r14 — previous rows are stale
    "multimodal_resize",
    "scan_xml",
    "dedup_incremental_substring",
    "graph_pagerank_converged",
    # r7-vintage cohort, complete (35)
    "agg_min_max_by",
    "agg_percentile_exact",
    "agg_pivot",
    "agg_retention_cohorts",
    "agg_rfm_segments",
    "agg_rolling_actives",
    "agg_rollup",
    "agg_stats_moments",
    "agg_stickiness_dau_mau_approx",
    "agg_string_agg",
    "agg_unpivot",
    "agg_window_funnel",
    "arn_parse",
    "bearer_extract",
    "error_route",
    "filter_required",
    "greeting_transform",
    "join_anti",
    "join_asof_event",
    "join_broadcast_lookup",
    "join_hash_equi",
    "join_left_outer",
    "join_range_theta",
    "join_salted_skew",
    "join_semi",
    "json_body_parse",
    "json_serialize",
    "jwt_verify",
    "observe_metrics",
    "policy_build",
    "qs_extract",
    "quality_expectations",
    "sql_recursive_hierarchy",
    "validate_numeric_reject",
    "window_ntile_percentile",
    # r8-vintage cohort, first 5 of 50 alphabetically (window cap)
    "agg_audience_overlap_approx",
    "agg_dp_count_laplace",
    "agg_ks_test_two_sample",
    "agg_roc_auc_rank",
    "dedup_exact",
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
