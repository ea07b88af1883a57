"""Empty-input robustness sweep: EVERY batch operator must survive a
dataset where all ten tables exist with their full schemas but zero
rows — the empty-partition day every 100 TB pipeline eventually feeds
a downstream job. Found-and-fixed by this sweep (round 5): schema
inference on 0-file partitioned read-backs (3 sinks), null z-order
bounds, an unresolvable stats filter on an empty JSON manifest, and a
missing watermark checkpoint field.

The contract is "no exception, sane row count" — aggregate shapes may
legitimately return a global-agg row of zeros; nothing may throw.
"""

from __future__ import annotations

import os

import pytest

from etl_8x8_spark.registry import all_queries

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in _TABLES:
        (
            spark.read.parquet(f"{sf_dir}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"{t}.parquet"))
        )
    return d


def test_every_batch_operator_survives_empty_tables(spark, empty_sf):
    """Each builder runs TWICE: the second invocation catches builders
    that mutate shared module state (StructType.add grew a duplicate
    _corrupt_record column per call until this sweep caught it — any
    long-lived session, including the driver's 3-run bench, hits
    that)."""
    failures = []
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue  # streaming semantics tested in test_streaming
        for attempt in (1, 2):
            try:
                n = spec.builder(spark, empty_sf).count()
                assert n >= 0
            except Exception as exc:  # noqa: BLE001 — collect all failures
                failures.append(
                    f"{name} (call {attempt}): "
                    f"{type(exc).__name__}: {str(exc)[:120]}"
                )
                break
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def nullish_sf(spark, sf_dir, tmp_path_factory):
    """Every table with ~20% of NON-KEY column values nulled (keys
    stay intact so joins still join) — the null-heavy day."""
    from pyspark.sql import functions as F

    key_cols = {
        "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
        "r_regionkey", "event_id", "user_id", "doc_id", "vec_id",
        "c_nationkey", "s_nationkey", "n_regionkey",
    }
    d = str(tmp_path_factory.mktemp("nullish_sf"))
    for t in _TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        out = df
        for c in df.columns:
            if c in key_cols:
                continue
            out = out.withColumn(
                c,
                F.when(F.abs(F.hash(F.lit(c), F.monotonically_increasing_id())) % 5 == 0, None)
                .otherwise(F.col(c)),
            )
        out.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_every_batch_operator_survives_null_heavy_data(spark, nullish_sf):
    """JVM built-ins null-propagate for free; the Python surfaces
    (UDTF, mapInPandas codecs, binary ingest) must guard explicitly —
    this sweep caught all five doing `None[0]` / `None.encode` in
    round 5. Contract: no exception; null payloads read as empty
    assets; null UDTF inputs expand to zero rows."""
    failures = []
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue
        try:
            assert spec.builder(spark, nullish_sf).count() >= 0
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)
