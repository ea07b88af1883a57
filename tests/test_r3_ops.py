"""Behavioral tests for the round-3 operators (bloom-pruned join,
SCD2 build, token packing, mixture rebalance, PII redaction, cosine
range search) — invariants the value-hash oracle can't state directly
(no false negatives, interval contiguity, budget bounds, rate targets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


def _q(name):
    return all_queries()[name].builder


class TestBloomPrunedJoin:
    def test_equals_plain_join_no_false_negatives(self, spark, sf_dir):
        from etl_8x8_spark.sources.readers import load_table

        got = _q("join_bloom_pruned")(spark, sf_dir)
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderpriority"
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_probe_actually_prunes(self, spark, sf_dir):
        # the bloom-filtered lineitem must be a strict subset at this
        # selectivity (~20% urgent + fp) — if the probe is a no-op the
        # operator is broadcasting complexity for nothing
        from etl_8x8_spark.operators.joins import _bf_probe_cond  # noqa: F401
        from etl_8x8_spark.sources.readers import load_table

        li_total = load_table(spark, sf_dir, "lineitem").count()
        joined = _q("join_bloom_pruned")(spark, sf_dir).count()
        assert joined < li_total * 0.5


class TestScd2Build:
    def test_intervals_contiguous_and_one_current(self, spark, sf_dir):
        df = _q("window_scd2_build")(spark, sf_dir).cache()
        # exactly one open (is_current) version per user
        bad_current = (
            df.groupBy("user_id")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
            .filter(F.col("n_open") != 1)
            .count()
        )
        assert bad_current == 0
        # each version's valid_to == next version's valid_from (half-open
        # chain with no gaps or overlaps)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("version")
        gaps = (
            df.withColumn("next_from", F.lead("valid_from").over(w))
            .filter(F.col("next_from").isNotNull())
            .filter(F.col("valid_to") != F.col("next_from"))
            .count()
        )
        assert gaps == 0
        # CDC compaction: no two consecutive versions share the attr
        noop = (
            df.withColumn("next_attr", F.lead("attr").over(w))
            .filter(F.col("next_attr").isNotNull())
            .filter(F.col("attr") == F.col("next_attr"))
            .count()
        )
        assert noop == 0
        df.unpersist()


class TestTokenBudgetPack:
    def test_packs_respect_budget_and_monotonicity(self, spark, sf_dir):
        from etl_8x8_spark.operators.text import _PACK_BUDGET

        df = _q("text_token_budget_pack")(spark, sf_dir).cache()
        packs = df.groupBy("lang", "pack_id").agg(
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("n_tokens").alias("biggest_doc"),
        )
        # a pack only exceeds the budget by (at most) the straddling
        # doc's tokens: pack_tokens < budget + biggest_doc
        over = packs.filter(
            F.col("pack_tokens") >= _PACK_BUDGET + F.col("biggest_doc")
        ).count()
        assert over == 0
        # pack ids are dense per lang starting at 0
        firsts = packs.groupBy("lang").agg(
            F.min("pack_id").alias("mn"),
            F.max("pack_id").alias("mx"),
            F.count("*").alias("n"),
        )
        bad = firsts.filter(
            (F.col("mn") != 0) | (F.col("n") != F.col("mx") + 1)
        ).count()
        assert bad == 0
        df.unpersist()


class TestMixtureRebalance:
    def test_rates_target_rarest_language(self, spark, sf_dir):
        from etl_8x8_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        counts = {
            r.lang: r.n
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        mn = min(counts.values())
        sampled = {
            r.lang: r.n
            for r in _q("sample_mixture_rebalance")(spark, sf_dir)
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        rare = min(counts, key=counts.get)
        # the rarest language is kept in full
        assert sampled[rare] == counts[rare]
        # every language lands within hash noise of the uniform target
        # (binomial: expect mn ± ~4*sqrt(mn))
        tol = max(4, int(4 * mn**0.5))
        for lang, n in sampled.items():
            assert abs(n - mn) <= tol, (lang, n, mn)


class TestPiiRedact:
    def test_planted_pii_found_and_scrubbed(self, spark, sf_dir):
        import re

        from etl_8x8_spark.operators.dedup import normalized  # noqa: F401
        from etl_8x8_spark.operators.text import (
            _EMAIL_RE,
            _IP_RE,
            _PHONE_RE,
            seeded_pii_corpus,
        )
        from etl_8x8_spark.sources.readers import load_table

        rows = _q("text_pii_redact")(spark, sf_dir).collect()
        for r in rows:
            assert r.n_emails == (1 if r.doc_id % 5 == 0 else 0), r
            assert r.n_phones == (1 if r.doc_id % 7 == 0 else 0), r
            assert r.n_ips == (1 if r.doc_id % 11 == 0 else 0), r
            assert r.had_pii == (r.n_emails + r.n_phones + r.n_ips > 0)
        # spot-check an actual redacted text end-to-end
        corpus = seeded_pii_corpus(load_table(spark, sf_dir, "documents"))
        text = corpus.filter(F.col("doc_id") == 35).collect()  # 35 % 5 == 0, % 7 == 0
        if text:
            red = (
                spark.createDataFrame(text)
                .select(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
                            _PHONE_RE,
                            "[PHONE]",
                        ),
                        _IP_RE,
                        "[IP]",
                    ).alias("t")
                )
                .collect()[0]
                .t
            )
            assert "[EMAIL]" in red and "[PHONE]" in red
            assert not re.search(_EMAIL_RE, red) and not re.search(_PHONE_RE, red)


class TestSimSearchRange:
    def test_floor_respected_and_consistent_with_topk(self, spark, sf_dir):
        from etl_8x8_spark.operators.similarity import _RANGE_TAU

        rng = _q("sim_search_range")(spark, sf_dir).collect()
        assert all(r.sim >= _RANGE_TAU for r in rng)
        # any range hit similar enough must appear in the exact top-k
        # result with the same similarity (both exact computations)
        topk = {
            (r.q_id, r.vec_id): r.sim
            for r in _q("sim_search_topk")(spark, sf_dir).collect()
        }
        for r in rng:
            if (r.q_id, r.vec_id) in topk:
                assert abs(topk[(r.q_id, r.vec_id)] - r.sim) < 1e-9
