"""Unit tests for aggregation operators — inline-fixture golden rows,
the reference's parametrized case-table style
(tests/src/test_handlers.py:112-130)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from etl_8x8_spark.operators.aggregates import q1_pricing_summary


@pytest.fixture(scope="module")
def tiny_lineitem(spark):
    rows = [
        # flag, status, qty, price, disc, tax, shipdate
        ("A", "F", 10.0, 100.0, 0.10, 0.05, "1995-01-01 00:00:00"),
        ("A", "F", 20.0, 200.0, 0.00, 0.00, "1995-06-01 00:00:00"),
        ("N", "O", 5.0, 50.0, 0.50, 0.10, "1996-01-01 00:00:00"),
        # after the Q1 cutoff — must be filtered out
        ("N", "O", 99.0, 999.0, 0.00, 0.00, "1999-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_shipdate string",
    )
    return df.withColumn("l_shipdate", df.l_shipdate.cast("timestamp"))


def test_q1_groups_and_filter(tiny_lineitem):
    got = {
        (r.l_returnflag, r.l_linestatus): r
        for r in q1_pricing_summary(tiny_lineitem).collect()
    }
    assert set(got) == {("A", "F"), ("N", "O")}
    af = got[("A", "F")]
    assert af.count_order == 2
    assert af.sum_qty == 30.0
    assert af.sum_base_price == 300.0
    # 100*0.9 + 200*1.0
    assert af.sum_disc_price == 290.0
    # 90*1.05 + 200
    assert af.sum_charge == pytest.approx(294.5)
    assert af.avg_qty == 15.0
    no = got[("N", "O")]
    assert no.count_order == 1  # cutoff row dropped
    assert no.sum_disc_price == 25.0


def test_flagship_runs_on_testdata(spark, sf_dir):
    from etl_8x8_spark.registry import all_queries

    df = all_queries()["agg_hash_group"].builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sum_qty", "avg_price", "count_order"} <= set(df.columns)


def test_approx_distinct_within_rsd(spark, sf_dir):
    from etl_8x8_spark.registry import all_queries

    exact = {
        r.event_type: r.n_users
        for r in all_queries()["agg_distinct_count"].builder(spark, sf_dir).collect()
    }
    rows = all_queries()["agg_approx_distinct"].builder(spark, sf_dir).collect()
    assert len(rows) == len(exact)
    for r in rows:
        # the query's own accuracy flag must hold, and its exact side
        # must agree with the plain countDistinct query
        assert r.within_rsd == 1, r
        assert r.n_users == exact[r.event_type]


def test_quantile_sketch_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_8x8_spark.registry import all_queries
    from etl_8x8_spark.sources.readers import load_table

    rows = all_queries()["agg_quantile_sketch"].builder(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.q
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("q"))
        .collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        # the query's own 2% sketch-accuracy flags must hold (accuracy=10k
        # on ~1e5-row groups), and the exact side must match percentile()
        assert (r.p50_ok, r.p95_ok, r.p99_ok) == (1, 1, 1), r
        e50, e95, e99 = exact[r.l_returnflag]
        assert abs(r.p50 - e50) < 1e-6 and abs(r.p95 - e95) < 1e-6
        assert abs(r.p99 - e99) < 1e-6


def test_observe_metrics_side_channel(spark, sf_dir):
    """R13: named metrics ride the same job, results unperturbed."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from etl_8x8_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("ingest")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_keys"),
    )
    n = observed.count()
    assert obs.get["rows_seen"] == n
    assert obs.get["null_keys"] == 0


def test_failfast_schema_boundary(spark):
    """R14: FAILFAST = the strict-boundary mode (AnalysisException for
    the reference's 400), vs PERMISSIVE corrupt-routing (the 415)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    bad_json = spark.sparkContext.parallelize(['{"k": 1}', '{"k']).map(
        lambda x: (x,)
    )
    df_txt = spark.createDataFrame(bad_json, "value string")
    import os
    from etl_8x8_spark.sources.readers import scratch_dir

    path = os.path.join(scratch_dir(), "failfast_demo")
    df_txt.coalesce(1).write.mode("overwrite").text(path)
    strict = (
        spark.read.schema("k INT")
        .option("mode", "FAILFAST")
        .json(path)
    )
    with _pytest.raises((PySparkException, Py4JJavaError)):
        strict.collect()


def test_hll_merge_matches_exact_and_one_shot(spark, sf_dir):
    """Merged per-cell sketches must estimate within HLL tolerance of
    the exact distinct count AND agree exactly with a single-level
    sketch over the same rows (HLL union at equal lgK is lossless)."""
    from pyspark.sql import functions as F

    from etl_8x8_spark.registry import all_queries
    from etl_8x8_spark.sources.readers import load_table

    from etl_8x8_spark.operators.aggregates import hll_merged_estimates

    exact = {
        r.event_type: r.n_users
        for r in all_queries()["agg_distinct_count"].builder(spark, sf_dir).collect()
    }
    query_rows = all_queries()["agg_hll_merge"].builder(spark, sf_dir).collect()
    merged = {
        r.event_type: r.approx_users
        for r in hll_merged_estimates(spark, sf_dir).collect()
    }
    one_shot = {
        r.event_type: r.approx_users
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("approx_users")
        )
        .collect()
    }
    assert len(query_rows) == len(exact)
    for r in query_rows:
        assert r.within_tol == 1, r
        assert r.n_users == exact[r.event_type]
    for k, n in exact.items():
        # lgK=14 -> rsd ~0.8%; allow 3 sigma plus small-count slack
        assert abs(merged[k] - n) <= max(2, 0.025 * n)
        assert merged[k] == one_shot[k]
