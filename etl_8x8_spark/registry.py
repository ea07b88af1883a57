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
# order. Round-8 priority: driver coverage hit literal 249/249 in r7,
# so the rotation is now pure STALEST-FIRST — the 8 keys whose latest
# green row is r2-vintage, then the 46 r3-vintage keys (alphabetical
# within a round; the driver's 50-key window leaves the last 4 for the
# next rotation). The keys round 8 touched (the histogram-rank persist
# family, agg_basket_affinity, agg_stickiness_dau_mau_approx) are
# verified locally via tools/verify_queries.py instead of spending
# driver slots: the edits are plan/tolerance-only and all carried r7
# driver-green rows.
# The TWELVE r8-new keys lead outright: they have never had a driver
# row. With them the list holds 66 keys and the driver's 50-key window
# reaches into the r3 block; the ~16 r3-vintage tail keys roll to the
# r9 rotation.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r8 — no driver evidence yet
    "dedup_semdedup",
    "pipeline_dedup_cascade",
    "sample_bottom_k_sketch",
    "agg_dp_count_laplace",
    "stream_static_enrich",
    "agg_ks_test_two_sample",
    "agg_roc_auc_rank",
    "embed_pq_encode",
    "agg_audience_overlap_approx",
    "text_quality_gopher",
    "sample_temperature_mixture",
    "embed_mrl_truncate",
    # r2-vintage evidence
    "env_derive",
    "join_asof_forward",
    "join_bucketed_colocated",
    "join_dim_scd2",
    "join_full_outer",
    "join_fuzzy_match",
    "join_range_bucketed",
    "quality_report",
    # r3-vintage evidence
    "dedup_exact",
    "fn_array",
    "fn_bitwise",
    "fn_conditional",
    "fn_date",
    "fn_encode_decode",
    "fn_format",
    "fn_json",
    "fn_map",
    "fn_math",
    "fn_string",
    "fn_url",
    "sample_group_cap",
    "sample_mixture_rebalance",
    "sample_systematic",
    "sample_train_test_split",
    "scan_csv",
    "scan_custom_source",
    "scan_json_lines",
    "scan_orc",
    "scan_parquet",
    "scan_schema_evolution",
    "scan_text",
    "set_except",
    "set_intersect",
    "set_union_dedup",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    "sink_parquet_partitioned",
    "sink_partition_overwrite",
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
