"""Round-4 waves 5-6: behavioral edge cases the oracle hash can't
distinguish on its own — NULL attribution, compaction precedence,
probability normalization, MAD degeneracy, argmax tie-breaks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


class TestAttributionLastTouch:
    def test_purchase_without_prior_touch_is_unattributed(
        self, spark, sf_dir, queries
    ):
        """A user's first-ever event being a purchase must yield NULL
        touch_id/gap_us, not a row drop and not a cross-user credit."""
        out = (
            queries["window_attribution_last_touch"]
            .builder(spark, sf_dir)
            .cache()
        )
        try:
            assert out.count() > 0
            # every row is a purchase; attributed rows carry both
            # columns, unattributed rows carry neither
            bad = out.filter(
                F.col("touch_id").isNull() != F.col("gap_us").isNull()
            ).count()
            assert bad == 0
            # gaps are positive and within the 7-day window
            from etl_8x8_spark.operators.windows import _ATTR_WINDOW_US

            out_of_window = out.filter(
                (F.col("gap_us") <= 0)
                | (F.col("gap_us") > _ATTR_WINDOW_US)
            ).count()
            assert out_of_window == 0
        finally:
            out.unpersist()

    def test_touch_precedes_purchase(self, spark, sf_dir, queries):
        """The attributed touch must be an earlier event than the
        purchase for the same user (join back to verify type+order)."""
        from etl_8x8_spark.sources.readers import load_table

        out = queries["window_attribution_last_touch"].builder(
            spark, sf_dir
        )
        events = load_table(spark, sf_dir, "events").select(
            F.col("event_id").alias("touch_id"),
            F.col("user_id").alias("t_user"),
            F.col("event_type").alias("t_type"),
            F.unix_micros("ts").alias("t_us"),
        )
        joined = out.filter(F.col("touch_id").isNotNull()).join(
            events, "touch_id"
        )
        assert joined.filter(
            (F.col("t_user") != F.col("user_id"))
            | (~F.col("t_type").isin("click", "view"))
            | (F.col("t_us") >= F.col("purchase_us"))
        ).count() == 0


class TestCdcApplyChanges:
    def test_delete_beats_updates_and_multi_change_keys_compact(
        self, spark, sf_dir, queries
    ):
        from etl_8x8_spark.operators.cdc import (
            _CH_D,
            _CH_OFF,
            _CH_U1,
            _CH_U2,
        )

        out = queries["cdc_apply_changes"].builder(spark, sf_dir).cache()
        try:
            key = F.col("o_orderkey")
            # deleted keys are gone even when they were also updated
            assert out.filter((key % _CH_D == 0) & (key < _CH_OFF)).count() == 0
            # %21 keys (not deleted) show the SECOND update pass
            u2 = out.filter(
                (key % _CH_U2 == 0) & (key % _CH_D != 0) & (key < _CH_OFF)
            )
            assert u2.count() > 0
            assert (
                u2.filter(F.col("o_orderpriority") != "U-PASS2").count() == 0
            )
            # %7-but-not-%21 keys show the first pass
            u1 = out.filter(
                (key % _CH_U1 == 0)
                & (key % _CH_U2 != 0)
                & (key % _CH_D != 0)
                & (key < _CH_OFF)
            )
            assert (
                u1.filter(F.col("o_orderpriority") != "U-PASS1").count() == 0
            )
            # inserts arrive under shifted keys
            assert out.filter(key >= _CH_OFF).count() > 0
        finally:
            out.unpersist()


class TestMarkovTransitions:
    def test_rows_normalize_to_one(self, spark, sf_dir, queries):
        """Per from_type, probabilities must sum to 1 (within the
        6-decimal rounding of each term)."""
        out = queries["agg_markov_transitions"].builder(spark, sf_dir)
        sums = (
            out.groupBy("from_type")
            .agg(F.sum("prob").alias("p"))
            .collect()
        )
        assert len(sums) == 5
        for r in sums:
            assert abs(r.p - 1.0) < 1e-4, r


class TestRobustMad:
    def test_mad_zero_on_constant_group_flags_nothing(self, spark):
        """A constant-valued group has MAD 0; the threshold 3·1.4826·0
        flags nothing (strict >), and med equals the constant."""
        from etl_8x8_spark.operators import aggregates as agg_mod

        df = spark.createDataFrame(
            [("a", 5.0)] * 10 + [("b", 1.0), ("b", 2.0), ("b", 100.0)],
            "event_type string, value double",
        )
        med = df.groupBy("event_type").agg(
            F.percentile("value", 0.5).alias("med")
        )
        dev = df.join(F.broadcast(med), "event_type").select(
            "event_type",
            "med",
            F.abs(F.col("value") - F.col("med")).alias("ad"),
        )
        mad = dev.groupBy("event_type").agg(
            F.percentile("ad", 0.5).alias("mad")
        )
        rows = {
            r.event_type: r
            for r in dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(
                F.min("med").alias("med"),
                F.min("mad").alias("mad"),
                F.sum(
                    F.when(
                        F.col("ad")
                        > agg_mod._MAD_K * agg_mod._MAD_SCALE * F.col("mad"),
                        1,
                    ).otherwise(0)
                ).alias("n_outliers"),
            )
            .collect()
        }
        assert rows["a"].mad == 0.0
        assert rows["a"].n_outliers == 0
        assert rows["a"].med == 5.0
        # the 100.0 in group b is a clear outlier vs MAD=1
        assert rows["b"].n_outliers == 1


class TestFnStruct:
    def test_struct_argmax_breaks_price_ties_by_orderkey(self, spark):
        """Two orders with the same price: the struct max must pick
        the higher orderkey (second field), deterministically."""
        df = spark.createDataFrame(
            [(1, 50.0, 10), (1, 50.0, 99), (1, 10.0, 500)],
            "o_custkey long, o_totalprice double, o_orderkey long",
        )
        top = df.groupBy("o_custkey").agg(
            F.max(
                F.struct(
                    F.col("o_totalprice").alias("p"),
                    F.col("o_orderkey").alias("k"),
                )
            ).alias("top")
        )
        r = top.collect()[0]
        assert r.top.p == 50.0 and r.top.k == 99


class TestDegreeDistribution:
    def test_histogram_mass_equals_vertex_count_and_degrees_positive(
        self, spark, sf_dir, queries
    ):
        out = queries["graph_degree_distribution"].builder(spark, sf_dir)
        rows = out.collect()
        assert all(r.degree >= 1 for r in rows)
        assert sum(r.n_vertices for r in rows) > 0


class TestNoVacuousOracles:
    def test_every_oracle_selects_rows_at_the_driver_gate_sf(self):
        """LESSONS.md #20: an empty result hash-matches vacuously and
        verifies nothing. Every oracle must return >= 1 row at sf0.01
        (the driver's correctness gate). DuckDB-only — runs the whole
        registry in seconds without a Spark session. Queries that are
        legitimately empty at the tiny sf0.001 (hyper-selective chains
        like Q20/Q21) are still covered here at the SF that counts.
        """
        import duckdb

        qs = all_queries()
        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'/root/testdata/sf0.01/{t}.parquet'"
            )
        empty = []
        for name, spec in qs.items():
            if spec.oracle is None:
                continue
            if len(con.execute(spec.oracle).fetchall()) == 0:
                empty.append(name)
        assert not empty, f"vacuously-empty oracles at sf0.01: {empty}"


class TestWeightedMedian:
    def test_constant_value_group_hits_width_zero_path(self, spark):
        """All values equal in a group → bucket width 0 → every row
        routes to bucket 0 and the residual pass sees the whole group;
        the median must be the constant and the crossing test must not
        divide by the zero width."""
        import os
        import shutil

        from etl_8x8_spark.registry import all_queries
        from etl_8x8_spark.sources.readers import scratch_dir

        d = os.path.join(scratch_dir(), "wmedian_const")
        shutil.rmtree(d, ignore_errors=True)
        df = spark.createDataFrame(
            [("A", 7.5, 3.0)] * 5 + [("B", 1.0, 1.0), ("B", 9.0, 9.0)],
            "l_returnflag string, l_extendedprice double, l_quantity double",
        )
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {
            r.l_returnflag: r
            for r in all_queries()["agg_weighted_median"]
            .builder(spark, d)
            .collect()
        }
        assert out["A"].wmedian == 7.5
        assert out["A"].total_weight == 15
        # group B: weights 1 and 9; half of 10 is 5 -> 9.0 crosses
        assert out["B"].wmedian == 9.0
