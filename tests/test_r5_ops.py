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


class TestVwap:
    def test_vwap_within_day_price_bounds_and_cum_monotone(
        self, spark, sf_dir, queries
    ):
        rows = queries["window_vwap"].builder(spark, sf_dir).collect()
        assert rows
        by_month = {}
        for r in rows:
            by_month.setdefault(r["month"], []).append(r)
        for month, rs in by_month.items():
            rs.sort(key=lambda r: r["day_str"])
            cums = [r["cum_volume"] for r in rs]
            assert cums == sorted(cums), month  # running volume monotone
            assert all(r["vwap"] > 0 for r in rs), month


class TestCohortLtv:
    def test_ltv_curves_monotone_and_cohorts_complete(
        self, spark, sf_dir, queries
    ):
        from etl_8x8_spark.sources.readers import load_table

        rows = queries["agg_cohort_ltv"].builder(spark, sf_dir).collect()
        assert rows
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r["cohort"], []).append(r)
        for cohort, rs in by_cohort.items():
            rs.sort(key=lambda r: r["month_age"])
            ltv = [r["cum_ltv_per_customer"] for r in rs]
            assert ltv == sorted(ltv), cohort  # LTV can only grow
            assert all(
                r["active_customers"] <= r["cohort_size"] for r in rs
            ), cohort
        # every customer belongs to exactly one cohort
        n_customers = (
            load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
        )
        assert sum(rs[0]["cohort_size"] for rs in by_cohort.values()) == n_customers


class TestIncrementalWatermark:
    def test_increment_plus_history_covers_table_once(
        self, spark, sf_dir, queries
    ):
        from etl_8x8_spark.operators.scalar_fns import F as _  # noqa: F401
        from etl_8x8_spark.sources.readers import load_table

        rows = queries["scan_incremental_watermark"].builder(spark, sf_dir).collect()
        n_new = sum(r["n_new"] for r in rows)
        orders = load_table(spark, sf_dir, "orders")
        total = orders.count()
        n_hist = orders.filter(
            F.col("o_orderdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        ).count()
        assert n_new == total - n_hist  # exactly-once: no gap, no overlap
        assert n_new > 0


class TestNeymanSampling:
    def test_allocation_tracks_variance_and_rates_realized(
        self, spark, sf_dir, queries
    ):
        rows = queries["sample_stratified_neyman"].builder(spark, sf_dir).collect()
        assert rows
        total = sum(r["n_rows"] for r in rows)
        sampled = sum(r["n_sampled"] for r in rows)
        # realized sample near the 10% budget (hash-binomial noise)
        assert 0.05 * total < sampled < 0.2 * total
        for r in rows:
            # realized rate within a loose band of the target rate
            expected = r["n_rows"] * r["rate_ppm"] / 1e6
            assert abs(r["n_sampled"] - expected) <= max(10, 0.5 * expected), r

    def test_membership_is_deterministic(self, spark, sf_dir, queries):
        a = queries["sample_stratified_neyman"].builder(spark, sf_dir).collect()
        b = queries["sample_stratified_neyman"].builder(spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestKeySkewReport:
    def test_report_identifies_the_planted_hot_supplier_key(
        self, spark, sf_dir, queries
    ):
        rows = {
            r["join_key"]: r
            for r in queries["quality_key_skew_report"].builder(spark, sf_dir).collect()
        }
        assert set(rows) == {
            "lineitem.l_partkey",
            "lineitem.l_suppkey",
            "orders.o_custkey",
            "events.user_id",
        }
        for r in rows.values():
            assert r["n_keys"] <= r["n_rows"]
            assert r["max_key_rows"] * r["n_keys"] >= r["n_rows"]  # max >= avg
            assert r["skew_ratio"] >= 1.0


class TestBiAnalytics:
    def test_rfm_scores_in_range_and_cells_consistent(self, spark, sf_dir, queries):
        rows = queries["agg_rfm_segments"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r["r_score"] <= 5
            assert 1 <= r["f_score"] <= 5
            assert 1 <= r["m_score"] <= 5
            assert r["rfm_cell"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]

    def test_abc_classes_partition_by_share(self, spark, sf_dir, queries):
        rows = queries["agg_abc_classification"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 < r["cum_share"] <= 1.000001
            if r["cum_share"] <= 0.8:
                assert r["abc_class"] == "A"
        # A-class revenue concentration: fewer A customers than C
        n = {c: sum(1 for r in rows if r["abc_class"] == c) for c in "ABC"}
        assert n["A"] > 0 and n["C"] > 0

    def test_fulfillment_latency_ordering(self, spark, sf_dir, queries):
        rows = queries["agg_fulfillment_latency"].builder(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["min_days"] <= r["median_days"] <= r["max_days"]
            assert r["min_days"] <= r["avg_days"] <= r["max_days"]

    def test_new_vs_returning_day_one_all_new(self, spark, sf_dir, queries):
        rows = sorted(
            queries["agg_new_vs_returning"].builder(spark, sf_dir).collect(),
            key=lambda r: r["day_str"],
        )
        assert rows[0]["returning_users"] == 0  # nobody returns on day 1
        total_new = sum(r["new_users"] for r in rows)
        from etl_8x8_spark.sources.readers import load_table

        n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
        assert total_new == n_users  # every user is new exactly once

    def test_streaks_bounded_by_active_days(self, spark, sf_dir, queries):
        rows = queries["window_streak_detection"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r["longest_streak_days"] <= r["active_days"]
            assert r["n_streaks"] >= 1

    def test_stickiness_in_unit_interval(self, spark, sf_dir, queries):
        rows = queries["agg_stickiness_dau_mau"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 < r["stickiness"] <= 1.000001


class TestPagerankConverged:
    def test_mass_and_monotone_structure(self, spark, sf_dir, queries):
        rows = queries["graph_pagerank_converged"].builder(spark, sf_dir).collect()
        assert len(rows) == 100
        # ranks positive and sorted descending
        scores = [r["pr_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0.15 for s in scores)  # every node keeps teleport mass

    def test_more_rounds_changes_little(self, spark, sf_dir, queries):
        """Near-convergence check: the top-10 node SET is stable
        between the registered ``_PR_ROUNDS`` (5) run and a 4-round
        rerun of the same loop — power iteration has settled the head
        of the ranking."""
        from etl_8x8_spark.operators.graph import graph_pagerank_converged

        full = graph_pagerank_converged(spark, sf_dir).limit(10).collect()
        import etl_8x8_spark.operators.graph as G

        orig = G._PR_ROUNDS
        try:
            G._PR_ROUNDS = 4
            half = graph_pagerank_converged(spark, sf_dir).limit(10).collect()
        finally:
            G._PR_ROUNDS = orig
        assert {r["node"] for r in full} == {r["node"] for r in half}


class TestKmeansConverged:
    def test_inertia_not_worse_than_single_round(self, spark, sf_dir, queries):
        """More Lloyd rounds can only reduce (or hold) total inertia —
        the monotone-improvement property of the algorithm."""
        one = sum(
            r["inertia"]
            for r in queries["ml_kmeans_lloyd"].builder(spark, sf_dir).collect()
        )
        four = sum(
            r["inertia"]
            for r in queries["ml_kmeans_converged"].builder(spark, sf_dir).collect()
        )
        assert four <= one + 1e-6
        # membership conserved
        n = sum(
            r["n_members"]
            for r in queries["ml_kmeans_converged"].builder(spark, sf_dir).collect()
        )
        from etl_8x8_spark.sources.readers import load_table

        assert n == load_table(spark, sf_dir, "embeddings").count()


class TestQualityExpectations:
    def test_clean_data_passes_all_rules(self, spark, sf_dir, queries):
        rows = queries["quality_expectations"].builder(spark, sf_dir).collect()
        assert len(rows) == 6
        assert all(r["passed"] for r in rows), rows

    def test_planted_violations_are_counted(self, spark, sf_dir, tmp_path):
        """Plant one null key, one duplicate key, and one negative
        price; the suite must count exactly those."""
        import os

        from pyspark.sql import functions as F

        from etl_8x8_spark.registry import all_queries
        from etl_8x8_spark.sources.readers import load_table

        orders = load_table(spark, sf_dir, "orders")
        bad = orders.limit(2).select(
            F.lit(None).cast("long").alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") * -1).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        dup = orders.limit(1)
        d = str(tmp_path)
        orders.unionByName(bad).unionByName(dup).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "orders.parquet"))
        rows = {
            r["rule"]: r
            for r in all_queries()["quality_expectations"].builder(spark, d).collect()
        }
        assert rows["orderkey_not_null"]["n_violations"] == 2
        assert rows["orderkey_unique"]["n_violations"] == 1
        assert rows["price_positive"]["n_violations"] == 2
        assert not rows["orderkey_unique"]["passed"]
