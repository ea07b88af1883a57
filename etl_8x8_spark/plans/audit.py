"""Plan auditing — the engine's "is this the plan I designed for?"
toolkit, used by tests/test_plans.py and usable interactively.

``audit(df)`` distills an executed plan into the facts that matter at
100 TB: what reached the scan (pushed filters, read schema), how many
exchanges the plan pays, which join strategies were picked, and
whether anything escapes the JVM.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> dict:
    """Distilled physical-plan facts for a DataFrame."""
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return {
        "shuffles": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        "pushed_filters": [p for p in pushed if p],
        "read_schemas": read_schemas,
        "python_eval": any(
            t in plan
            for t in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "PythonDataSource",
            )
        ),
        # a UDTF node is a sanctioned table-function surface, not a
        # scalar row-loop smell — match BatchEvalPython NOT followed
        # by UDTF
        "row_at_a_time_python": bool(
            re.search(r"BatchEvalPython(?!UDTF)", plan)
        ),
        "python_udtf": "EvalPythonUDTF" in plan,
        "whole_stage_codegen": "WholeStageCodegen" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "bucketed_scan": "Bucketed: true" in plan,
    }


def audit_all(spark, sf_dir: str) -> dict[str, dict]:
    """Audit every registered (non-streaming) query's plan."""
    from etl_8x8_spark.registry import all_queries

    out = {}
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue  # streaming plans are built at start(), not here
        out[name] = audit(spec.builder(spark, sf_dir))
    return out


def scan_metrics(df: DataFrame) -> dict:
    """Execute ``df`` via collect() and return the leaf scan's SQL
    metrics (numOutputRows, numFiles, ...) — the quantitative check
    that row-group/file skipping actually engaged, which the plan
    string alone cannot show."""
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    m = leaf.metrics()
    it = m.iterator()
    vals: dict[str, int] = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals
