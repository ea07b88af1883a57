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
    failures = []
    for name, spec in all_queries().items():
        if name.startswith("stream_"):
            continue  # streaming semantics tested in test_streaming
        try:
            n = spec.builder(spark, empty_sf).count()
            assert n >= 0
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)
