"""Behavioral tests for the CDC / graph / quantize operators —
residue bookkeeping of the planted snapshot churn, rank-mass
conservation under integer micro-units, and quantization error
bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


def _q(name):
    return all_queries()[name].builder


class TestSnapshotDiff:
    def test_change_classes_match_residues(self, spark, sf_dir):
        from etl_8x8_spark.operators.cdc import _DEL, _INS, _INS_OFF, _UPD

        diff = _q("cdc_snapshot_diff")(spark, sf_dir).cache()
        try:
            bad_del = diff.filter(
                (F.col("change_type") == "delete")
                & (F.col("o_orderkey") % _DEL != 0)
            )
            assert bad_del.count() == 0
            # updates: priority-rewrite keys, minus deleted ones
            bad_upd = diff.filter(
                (F.col("change_type") == "update")
                & (
                    (F.col("o_orderkey") % _UPD != 0)
                    | (F.col("o_orderkey") % _DEL == 0)
                )
            )
            assert bad_upd.count() == 0
            ins = diff.filter(F.col("change_type") == "insert")
            assert ins.filter(F.col("o_orderkey") < _INS_OFF).count() == 0
            assert (
                ins.filter(
                    (F.col("o_orderkey") - _INS_OFF) % _INS != 0
                ).count()
                == 0
            )
            # every class is non-empty at any SF and carries the right
            # old/new sides
            kinds = {
                r["change_type"]: r["n"]
                for r in diff.groupBy("change_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            assert set(kinds) == {"insert", "delete", "update"}
            assert (
                diff.filter(
                    (F.col("change_type") == "insert")
                    & F.col("old_priority").isNotNull()
                ).count()
                == 0
            )
            assert (
                diff.filter(
                    (F.col("change_type") == "delete")
                    & F.col("new_priority").isNotNull()
                ).count()
                == 0
            )
            assert (
                diff.filter(
                    (F.col("change_type") == "update")
                    & (F.col("new_priority") != "X-CHANGED")
                ).count()
                == 0
            )
        finally:
            diff.unpersist()

    def test_diff_is_minimal(self, spark, sf_dir):
        # applying the diff to the old snapshot must reproduce the new
        # snapshot's keyset exactly: old - deletes + inserts == new
        from etl_8x8_spark.operators.cdc import _new_snapshot
        from etl_8x8_spark.sources.readers import load_table

        diff = _q("cdc_snapshot_diff")(spark, sf_dir)
        old = load_table(spark, sf_dir, "orders").select("o_orderkey")
        new = _new_snapshot(load_table(spark, sf_dir, "orders")).select(
            "o_orderkey"
        )
        dels = diff.filter(F.col("change_type") == "delete").select("o_orderkey")
        ins = diff.filter(F.col("change_type") == "insert").select("o_orderkey")
        rebuilt = old.exceptAll(dels).unionByName(ins)
        assert rebuilt.exceptAll(new).count() == 0
        assert new.exceptAll(rebuilt).count() == 0


class TestPageRank:
    def test_teleport_floor_and_isolated_parts(self, spark, sf_dir):
        from etl_8x8_spark.sources.readers import load_table

        pr = _q("graph_pagerank_iter")(spark, sf_dir).cache()
        try:
            assert pr.filter(F.col("pr_score") < 0.15).count() == 0
            assert (
                pr.filter(
                    (F.col("n_in") == 0) & (F.col("pr_score") != 0.15)
                ).count()
                == 0
            )
            # covers every part exactly once
            parts = load_table(spark, sf_dir, "part").count()
            assert pr.count() == parts
            assert pr.select("p_partkey").distinct().count() == parts
        finally:
            pr.unpersist()

    def test_rank_mass_conserved_per_supplier(self, spark, sf_dir):
        # each supplier distributes ~1 unit of rank: d * (SCALE div d)
        # is within d micro-units of SCALE (floor-division loss only)
        from etl_8x8_spark.operators.graph import _SCALE
        from etl_8x8_spark.sources.readers import load_table

        li = load_table(spark, sf_dir, "lineitem")
        edges = li.select("l_suppkey", "l_partkey").distinct()
        deg = edges.groupBy("l_suppkey").agg(F.count("*").alias("d"))
        mass = deg.select(
            "d", (F.col("d") * F.expr(f"{_SCALE} div d")).alias("m")
        )
        bad = mass.filter(
            (F.col("m") > _SCALE) | (F.col("m") < _SCALE - F.col("d"))
        )
        assert bad.count() == 0


class TestQuantize:
    def test_range_and_error_bound(self, spark, sf_dir):
        q = _q("embed_normalize_quantize")(spark, sf_dir).select(
            "vec_id",
            "l2_norm",
            F.from_json("q_vec", "array<int>").alias("qv"),
            "q_l1",
        )
        # int8 range after normalization
        assert (
            q.filter(
                (F.array_max("qv") > 127) | (F.array_min("qv") < -127)
            ).count()
            == 0
        )
        # checksum consistent with the serialized vector
        l1 = F.aggregate(
            F.transform("qv", lambda v: F.abs(v)),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        assert q.filter(l1 != F.col("q_l1")).count() == 0

    def test_dequantization_reconstructs(self, spark, sf_dir):
        from etl_8x8_spark.sources.readers import load_table

        q = _q("embed_normalize_quantize")(spark, sf_dir).select(
            "vec_id", "l2_norm", F.from_json("q_vec", "array<int>").alias("qv")
        )
        emb = load_table(spark, sf_dir, "embeddings")
        j = q.join(emb, "vec_id").select(
            "vec_id",
            F.zip_with(
                "qv",
                "embedding",
                lambda qi, v: F.abs(
                    qi.cast("double") / 127 * F.col("l2_norm")
                    - v.cast("double")
                ),
            ).alias("err"),
            "l2_norm",
        )
        # per-component dequantization error <= half a quantization
        # step (l2/254), plus epsilon for the rounded norm
        bad = j.filter(
            F.array_max("err") > F.col("l2_norm") / 254 + 1e-4
        )
        assert bad.count() == 0
