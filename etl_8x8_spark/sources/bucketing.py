"""Bucketed-table layout — the storage-side lever for repeated
large-large joins (BASELINE.md: bucketing is the 100× win for
orders ⋈ lineitem at scale).

Both tables are written bucketed INTO THE SAME bucket count on the
join key; a join between them then needs no exchange at all — each
task reads bucket i of both sides and hash-joins locally. At 100 TB
this removes the dominant shuffle of every repeated fact-fact join
(pay one bucketed write, amortize over every subsequent join, the
same trade the reference makes with its SSM memo cache, R10).

Bucketing metadata lives in the session catalog, so tables are
(re-)registered per session; the parquet files themselves are reused
across sessions once written.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_8x8_spark.sources.readers import load_table, scratch_dir


def _warehouse_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int,
) -> str:
    """Ensure a bucketed copy of ``table`` exists and is registered in
    the session catalog; returns the catalog table name."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"{table}_bucketed_{tag}"
    if spark.catalog.tableExists(name):
        return name
    df = load_table(spark, sf_dir, table)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", os.path.join(scratch_dir(), "warehouse", name))
        .saveAsTable(name)
    )
    return name


def bucketed_orders_lineitem(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Orders and lineitem as co-bucketed catalog tables on the join
    key (same bucket count on both sides — mismatched counts force a
    one-sided shuffle)."""
    o = _warehouse_table(spark, sf_dir, "orders", "o_orderkey", n_buckets)
    l = _warehouse_table(spark, sf_dir, "lineitem", "l_orderkey", n_buckets)
    return spark.table(o), spark.table(l)
