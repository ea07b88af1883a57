"""Round-5 operator tests: the approximate (HLL) profile twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


class TestMetadataStatsApprox:
    def test_estimates_within_tolerance(self, spark, sf_dir, queries):
        rows = (
            queries["scan_metadata_stats_approx"].builder(spark, sf_dir).collect()
        )
        assert {r["col"] for r in rows} == {
            "o_custkey",
            "o_orderpriority",
            "o_orderstatus",
            "o_totalprice",
        }
        for r in rows:
            assert r["within_rsd"] == 1, r
            assert r["n_distinct"] <= r["n_nonnull"] <= r["n_rows"]

    def test_production_shape_has_no_expand(self, spark, sf_dir):
        """The approx-only profile must stay scan-shaped: HLL sketches
        aggregate in one pass with NO count-distinct Expand (the exact
        profile's Expand multiplies scan rows ~9x — the thing the
        100 TB ANALYZE path exists to avoid)."""
        from etl_8x8_spark.sources.scans import profile_approx_plan

        plan = (
            profile_approx_plan(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan, plan
        # and it still computes: one row, sane values
        row = profile_approx_plan(spark, sf_dir).first()
        assert row["n_rows"] > 0

    def test_registered_exact_matches_exact_profile(self, spark, sf_dir, queries):
        """n_distinct in the approx twin must equal the exact
        profile's n_distinct (the flag, not the count, carries the
        approximation)."""
        approx = {
            r["col"]: r["n_distinct"]
            for r in queries["scan_metadata_stats_approx"]
            .builder(spark, sf_dir)
            .collect()
        }
        exact = {
            r["col"]: r["n_distinct"]
            for r in queries["scan_metadata_stats"].builder(spark, sf_dir).collect()
        }
        assert approx == exact
