"""Round-12 tests: the two new curation operators (r11 verdict item
8) and the theil_sen histogram-prune rework (item 1).

Oracle hash parity is the driver's job; these pin the SEMANTICS the
hash alone can't localize — hand-computed BPE merges, classifier
sign/threshold consistency, and theil_sen's exactness vs the plain
percentile it replaced.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


class TestBpeTokenCount:
    def test_hand_computed_merges(self, spark):
        """Rank-ordered cascade on known words: 'the' collapses via
        t+h then th+e; 'ing' via i+n then in+g; 'another' stops at
        an|o|the|r (the 'e' is consumed by th+e before e+r can fire,
        and a+n fires on the untouched prefix)."""
        from etl_8x8_spark.operators.text import bpe_symbols

        df = spark.createDataFrame(
            [("the",), ("ing",), ("and",), ("another",), ("xyz",)],
            "w string",
        ).select("w", bpe_symbols("w").alias("s"))
        got = {r["w"]: r["s"] for r in df.collect()}
        assert got["the"] == ["the"]
        assert got["ing"] == ["ing"]
        assert got["and"] == ["and"]
        assert got["another"] == ["an", "o", "the", "r"]
        assert got["xyz"] == ["x", "y", "z"]  # no rule applies

    def test_nonoverlapping_left_to_right(self, spark):
        """'ththth' → th,th,th (each pair consumed once); 'erer' →
        er,er; a merged symbol never re-fires its own rule."""
        from etl_8x8_spark.operators.text import bpe_symbols

        df = spark.createDataFrame(
            [("ththth",), ("erer",), ("tthh",)], "w string"
        ).select("w", bpe_symbols("w").alias("s"))
        got = {r["w"]: r["s"] for r in df.collect()}
        assert got["ththth"] == ["th", "th", "th"]
        assert got["erer"] == ["er", "er"]
        # t|t,h|h: the middle t+h merges, the outer chars stay single
        assert got["tthh"] == ["t", "th", "h"]

    def test_counts_bounded_by_words_and_chars(self, spark):
        out = (
            all_queries()["text_bpe_token_count"]
            .builder(spark, SF_DIR)
            .collect()
        )
        assert len(out) > 0
        for r in out:
            # every word yields >= 1 piece; a piece is >= 1 char
            assert r["n_words"] <= r["n_bpe_tokens"]
            assert 1.0 <= r["chars_per_token"]


class TestQualityClassifier:
    def test_sign_threshold_consistency(self, spark):
        """keep is the exact integer-sum sign; logit and prob must
        agree with it (prob > 0.5 iff positive logit, modulo the
        1e-6 quantization at exactly zero)."""
        out = (
            all_queries()["text_quality_classifier"]
            .builder(spark, SF_DIR)
            .collect()
        )
        assert len(out) > 0
        kept = sum(1 for r in out if r["keep"])
        assert 0 < kept < len(out)  # the gate actually splits the corpus
        for r in out:
            assert 0.0 < r["prob"] < 1.0
            assert r["n_tokens"] >= 1
            if r["logit"] > 0:
                assert r["keep"] and r["prob"] >= 0.5
            elif r["logit"] < 0:
                assert not r["keep"] and r["prob"] <= 0.5

    def test_zero_shuffle_plan(self, spark):
        """The scoring stage must be one codegen'd projection over the
        scan — no KEY shuffle anywhere: the only exchanges allowed are
        the output ordering (rangepartitioning) and the r16 widen_scan
        round-robin spread of the one-row-group fixture scan (a spread,
        not a data shuffle — absent on properly-split inputs)."""
        df = all_queries()["text_quality_classifier"].builder(
            spark, SF_DIR
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning" not in plan  # no groupBy/join shuffle
        assert plan.lower().count("rangepartitioning") == 1  # the orderBy
        assert "aggregate" in plan.lower()  # the HOF fold, not a shuffle


class TestTheilSenRework:
    def test_matches_plain_percentile(self, spark):
        """The histogram-pruned median must equal F.percentile over
        the same pairwise slope relation bit-for-bit (the rework's
        whole contract: identical result, ~8× less wall)."""
        row = (
            all_queries()["window_theil_sen"]
            .builder(spark, SF_DIR)
            .collect()[0]
        )
        from etl_8x8_spark.functions.parity import DEC
        from etl_8x8_spark.sources.readers import load_table

        orders = load_table(spark, SF_DIR, "orders")
        epoch_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        daily = orders.groupBy(
            F.floor(epoch_us / F.lit(86400 * 1_000_000))
            .cast("long")
            .alias("day_no")
        ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue"))
        a, b = daily.alias("a"), daily.alias("b")
        slopes = a.join(b, F.col("a.day_no") < F.col("b.day_no")).select(
            (
                (
                    F.col("b.revenue").cast("double")
                    - F.col("a.revenue").cast("double")
                )
                / (F.col("b.day_no") - F.col("a.day_no"))
            ).alias("slope")
        )
        ref = slopes.agg(
            F.count("*").alias("n"),
            (
                F.floor(
                    F.percentile("slope", F.lit(0.5)) * 1e6 + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("med"),
        ).collect()[0]
        assert row["n_pairs"] == ref["n"]
        assert row["slope"] == ref["med"]
