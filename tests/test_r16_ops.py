"""r16 optimization-round pins: the iterative-loop checkpoint escape
hatch and the honest-timing invariants."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


class TestCheckpointEscapeHatch:
    """functions/iterative.py (VERDICT r15 items 5/9): the bounded
    loops persist per round by default; SPARK_GRAFT_CHECKPOINT_EVERY
    makes every Nth round a lazy localCheckpoint. Results must be
    identical either way — only the plan boundary moves."""

    def _rows(self, spark, name):
        from etl_8x8_spark.registry import all_queries

        df = all_queries()[name].builder(spark, SF)
        return sorted(map(tuple, df.collect()))

    @pytest.mark.parametrize(
        "name",
        ["graph_pagerank_converged", "graph_bfs_layers", "dedup_cluster_cc"],
    )
    def test_checkpoint_every_round_same_result(
        self, spark, name, monkeypatch
    ):
        base = self._rows(spark, name)
        spark.catalog.clearCache()
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_EVERY", "1")
        hatch = self._rows(spark, name)
        spark.catalog.clearCache()
        assert base == hatch

    def test_cadence_parsing(self, monkeypatch):
        from etl_8x8_spark.functions.iterative import (
            DEFAULT_CHECKPOINT_EVERY,
            checkpoint_every,
        )

        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_EVERY", raising=False)
        assert checkpoint_every() == DEFAULT_CHECKPOINT_EVERY
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_EVERY", "3")
        assert checkpoint_every() == 3
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_EVERY", "0")
        assert checkpoint_every() == 0

    def test_checkpoint_truncates_lineage(self, spark, monkeypatch):
        """With cadence 1 every round is a localCheckpoint: the
        terminal plan must contain a scanned checkpoint RDD instead of
        a persisted InMemoryRelation chain."""
        from etl_8x8_spark.registry import all_queries

        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_EVERY", "1")
        df = all_queries()["graph_bfs_layers"].builder(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "ExistingRDD" in plan
        spark.catalog.clearCache()


class TestInt64GuardsNullTransparent:
    """r16: on EMPTY input the 1-row totals aggregate carries NULL
    sums; the guards must pass NULL through instead of raising —
    AQE can materialize the guarded broadcast side before the
    empty-stream propagation cancels the join (the flaky
    agg_ks_test_two_sample empty-sweep failure)."""

    def test_null_totals_do_not_raise(self, spark):
        from pyspark.sql import functions as F

        from etl_8x8_spark.operators.aggregates import (
            _guard_product_fits_int64,
            _guard_sum_sq_fits_int64,
        )

        empty = spark.range(0).select(
            F.col("id").alias("a"), F.col("id").alias("b")
        )
        totals = empty.agg(
            F.sum("a").cast("long").alias("a"),
            F.sum("b").cast("long").alias("b"),
        )
        g = _guard_product_fits_int64(totals, "a", "b", "t")
        g = _guard_sum_sq_fits_int64(g, "a", "b", "t")
        rows = g.collect()  # the 1-row NULL relation must NOT raise
        assert rows[0]["a"] is None

    def test_oversized_totals_still_raise(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from etl_8x8_spark.operators.aggregates import (
            _guard_product_fits_int64,
        )

        big = spark.range(1).select(
            F.lit(2**33).cast("long").alias("a"),
            F.lit(2**33).cast("long").alias("b"),
        )
        g = _guard_product_fits_int64(big, "a", "b", "t")
        with pytest.raises(Exception, match="2\\^62"):
            g.collect()
