"""Round-8 tests: the one-pass multi-column histogram rank
(histogram_global_rank_multi) that replaced agg_rfm_segments' chained
rank calls, the NULL fail-fast contract on both rank helpers, and the
TakeOrderedAndProject top-K pin for the vocab-sized text windows
(this Spark build's InferWindowGroupLimit fires only for PARTITIONED
windows, so `row_number over global window + filter` would funnel the
whole vocabulary into one task — measured in round 8).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_8x8_spark.functions.ranks import (
    histogram_global_rank,
    histogram_global_rank_multi,
)


def _adversarial_df(spark):
    """Rows engineered to stress bucketing across THREE rankable
    columns at once: ties, constant runs, outliers, negatives, and
    deliberately different orders per column."""
    rows = []
    for i in range(200):
        a = float(i % 7)            # heavy ties
        b = 5.0                      # constant column (one-bucket path)
        c = float((i * 37) % 199) - 99.0  # negatives + spread
        if i in (13, 77):
            c = 1e9 if i == 13 else -1e9  # clamp outliers
        rows.append((i, a, b, c))
    return spark.createDataFrame(rows, "k INT, a DOUBLE, b DOUBLE, c DOUBLE")


class TestHistogramGlobalRankMulti:
    def test_matches_naive_windows_mixed_directions(self, spark):
        df = _adversarial_df(spark)
        got = histogram_global_rank_multi(
            df,
            [("a", "ra", False), ("b", "rb", True), ("c", "rc", True)],
            ["k"],
        )
        naive = df.select(
            "k",
            F.row_number()
            .over(Window.orderBy(F.col("a").asc(), F.col("k").asc()))
            .alias("wa"),
            F.row_number()
            .over(Window.orderBy(F.col("b").desc(), F.col("k").asc()))
            .alias("wb"),
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("k").asc()))
            .alias("wc"),
        )
        bad = (
            got.join(naive, "k")
            .filter(
                (F.col("ra") != F.col("wa"))
                | (F.col("rb") != F.col("wb"))
                | (F.col("rc") != F.col("wc"))
            )
            .count()
        )
        assert bad == 0
        assert got.select("n").distinct().collect()[0][0] == df.count()

    def test_payload_columns_survive(self, spark):
        """The carry-through regroup must return every input column
        with its original value (no join-back is performed)."""
        df = _adversarial_df(spark)
        got = histogram_global_rank_multi(df, [("a", "ra", False)], ["k"])
        assert set(got.columns) == {"k", "a", "b", "c", "ra", "n"}
        bad = (
            got.join(df.withColumnRenamed("a", "a0"), "k")
            .filter(F.col("a") != F.col("a0"))
            .count()
        )
        assert bad == 0

    def test_windows_all_partitioned(self, spark):
        """Neither the probe window nor the offsets window may be
        unpartitioned: probe partitions on (cid, bucket), offsets on
        cid — nothing in the plan serializes a data-sized relation."""
        df = _adversarial_df(spark)
        got = histogram_global_rank_multi(
            df, [("a", "ra", False), ("c", "rc", True)], ["k"]
        )
        plan = got._jdf.queryExecution().optimizedPlan().toString()
        for ln in plan.splitlines():
            if "windowspecdefinition" in ln:
                assert "windowspecdefinition(_hm_" in ln, ln

    def test_null_values_rank_first_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 1.0), (4, None)], "k INT, v DOUBLE"
        )
        got = {
            r["k"]: r["rv"]
            for r in histogram_global_rank_multi(
                df, [("v", "rv", False)], ["k"]
            ).collect()
        }
        # NULLs first (k=2 then k=4 by tiebreak), then 1.0, then 5.0
        assert got == {2: 1, 4: 2, 3: 3, 1: 4}


class TestSingleRankNullHandling:
    """NULL ordering values must never be silently dropped (the r7
    advice: a NULL bucket id vanished at the inner offsets join).
    They rank like Spark's window defaults: first ascending, last
    descending."""

    def test_nulls_first_ascending(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 1.0)], "k INT, v DOUBLE"
        )
        got = {
            r["k"]: r["i"]
            for r in histogram_global_rank(df, "v", ["k"]).collect()
        }
        assert got == {2: 1, 3: 2, 1: 3}

    def test_nulls_last_descending(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 1.0)], "k INT, v DOUBLE"
        )
        got = {
            r["k"]: r["i"]
            for r in histogram_global_rank(
                df, "v", ["k"], descending=True
            ).collect()
        }
        assert got == {1: 1, 3: 2, 2: 3}


class TestVocabTopKPlan:
    """text_tfidf_terms / text_zipf_fit order a relation whose
    cardinality grows with corpus size (the vocabulary). The top-K cut
    must be TakeOrderedAndProject (per-partition top-K, parallel), and
    any window in the plan must run AFTER the limit — i.e. the plan
    must not contain a Window whose child is the vocab aggregate."""

    @pytest.mark.parametrize("key", ["text_tfidf_terms", "text_zipf_fit"])
    def test_take_ordered_top_k(self, spark, sf_dir, key):
        from etl_8x8_spark.registry import all_queries

        df = all_queries()[key].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan[:800]

    @pytest.mark.parametrize("key", ["text_tfidf_terms", "text_zipf_fit"])
    def test_results_unchanged(self, spark, sf_dir, key):
        """The limit-then-rank rewrite is semantically identical to
        the old rank-then-filter form (total ordering => same rows,
        same ranks)."""
        from etl_8x8_spark.registry import all_queries

        rows = all_queries()[key].builder(spark, sf_dir).collect()
        assert rows, key
        if key == "text_tfidf_terms":
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
