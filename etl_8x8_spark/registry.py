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
# order. Round-15 priority (r14 verdict item 4 + the r15 changes),
# filling exactly the 50-slot window as 9 + 2 + 39:
#   0. the 9 r15-new keys (deletion vectors, avro scan, column
#      mapping, zorder OPTIMIZE, partitioned table, exactly-once
#      stream sink, CHECK constraints, shallow clone, identity
#      columns — no driver evidence yet);
#   1. the 2 keys whose implementation materially changed in r15
#      (sink_txn_log_schema_evolution: generation-grouped reader +
#      split-gen1 fixture; stream_txn_log_tail: name-based Arrow
#      column lookup) — their r14 rows are stale evidence.
#      sink_txn_log_conflict's r15 change (assert → raise) is
#      behavior-neutral under normal execution and its r14 row is one
#      round old, so it yields its slot to the aging cohort;
#   2. 39 of the 45-key r8-vintage cohort (the oldest evidence after
#      the r14 rotation retired r7); the remaining 6
#      (sink_json_roundtrip, sink_parquet_partitioned,
#      sink_partition_overwrite, stream_static_enrich,
#      text_quality_gopher, sink_csv_roundtrip) roll to r16.
# Target: after the r15 driver run at most 6 keys older than r9.
# bench.py's HEADLINE order is independent and unaffected.
_SAMPLE_PRIORITY = [
    # new in r15 — no driver evidence yet
    "sink_txn_log_delete_vectors",
    "scan_avro",
    "sink_txn_log_column_mapping",
    "sink_txn_log_optimize_zorder",
    "sink_txn_log_partitioned",
    "stream_txn_log_sink",
    "sink_txn_log_constraints",
    "sink_txn_log_shallow_clone",
    "sink_txn_log_identity",
    # implementation changed in r15 — previous rows are stale
    "sink_txn_log_schema_evolution",
    "stream_txn_log_tail",
    # r8-vintage cohort, 39 of 45
    "dedup_semdedup",
    "embed_mrl_truncate",
    "embed_pq_encode",
    "env_derive",
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
    "join_asof_forward",
    "join_bucketed_colocated",
    "join_dim_scd2",
    "join_full_outer",
    "join_fuzzy_match",
    "join_range_bucketed",
    "pipeline_dedup_cascade",
    "quality_report",
    "sample_bottom_k_sketch",
    "sample_group_cap",
    "sample_mixture_rebalance",
    "sample_systematic",
    "sample_temperature_mixture",
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
