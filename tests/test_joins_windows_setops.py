"""Edge-case unit tests for joins / windows / setops (SURVEY.md §5:
inline-fixture case tables — null keys, empty groups, ties — the
reference's negative-test style applied to relational operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "null-key"), (4, "d")],
        "k long, lv string",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [(1, "x"), (1, "x2"), (None, "null-key-r"), (5, "z")],
        "k long, rv string",
    )


class TestJoinEdges:
    """Null keys never match (SQL semantics); duplicates multiply."""

    def test_inner_null_keys_dropped(self, left, right):
        got = left.join(right, "k").select("k", "lv", "rv").collect()
        assert {(r.k, r.rv) for r in got} == {(1, "x"), (1, "x2")}

    def test_left_outer_preserves_null_key_row(self, left, right):
        got = left.join(right, "k", "left").collect()
        by_lv = {}
        for r in got:
            by_lv.setdefault(r.lv, []).append(r.rv)
        assert sorted(by_lv["a"]) == ["x", "x2"]  # dup multiplication
        assert by_lv["null-key"] == [None]  # kept, unmatched
        assert by_lv["b"] == [None]
        assert by_lv["d"] == [None]

    def test_semi_anti_partition_left(self, left, right):
        semi = {r.lv for r in left.join(right, "k", "left_semi").collect()}
        anti = {r.lv for r in left.join(right, "k", "left_anti").collect()}
        assert semi == {"a"}
        # anti gets everything else INCLUDING the null key (no match)
        assert anti == {"b", "null-key", "d"}
        assert semi | anti == {r.lv for r in left.collect()}

    def test_semi_never_duplicates(self, left, right):
        semi = left.join(right, "k", "left_semi").collect()
        assert len(semi) == 1  # two right matches, still one output row


class TestAsofEdges:
    def test_asof_no_prior_click_is_null(self, spark):
        from etl_8x8_spark.operators.joins import join_asof_event  # noqa: F401

        rows = [
            # user 1: click before purchase, click after purchase
            (1, "2024-01-01 00:00:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 00:10:00", 1, "purchase", 1.0, "{}"),
            (3, "2024-01-01 00:20:00", 1, "click", 0.0, "{}"),
            # user 2: purchase with NO prior click
            (4, "2024-01-01 00:05:00", 2, "purchase", 1.0, "{}"),
            # user 3: click at the SAME timestamp as the purchase
            (5, "2024-01-01 00:30:00", 3, "click", 0.0, "{}"),
            (6, "2024-01-01 00:30:00", 3, "purchase", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts",
            F.col("event_id").alias("click_id"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts",
            F.lit(None).cast("long").alias("click_id"),
            F.col("event_id").alias("purchase_id"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy(
                F.col("ts"),
                F.col("purchase_id").asc_nulls_first(),
                F.col("click_id"),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = {
            r.purchase_id: r.last_click_id
            for r in clicks.unionByName(purchases)
            .withColumn(
                "last_click_id", F.last("click_id", ignorenulls=True).over(w)
            )
            .filter(F.col("purchase_id").isNotNull())
            .collect()
        }
        assert out[2] == 1  # prior click, not the later one
        assert out[4] is None  # no prior click -> null
        assert out[6] == 5  # same-timestamp click IS visible (ts <= ts)


class TestWindowEdges:
    def test_topn_ties_break_on_orderkey(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 100.0), (1, 11, 100.0), (1, 12, 100.0), (1, 13, 100.0)],
            "cust long, okey long, price double",
        )
        w = Window.partitionBy("cust").orderBy(
            F.col("price").desc(), F.col("okey")
        )
        got = (
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .collect()
        )
        assert [(r.okey, r.rnk) for r in sorted(got, key=lambda r: r.rnk)] == [
            (10, 1), (11, 2), (12, 3),
        ]

    def test_lag_first_row_null_and_single_row_group(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (1, 200), (2, 500)], "uid long, t long"
        )
        w = Window.partitionBy("uid").orderBy("t")
        got = {
            (r.uid, r.t): r.gap
            for r in df.select(
                "uid", "t", (F.col("t") - F.lag("t").over(w)).alias("gap")
            ).collect()
        }
        assert got[(1, 100)] is None  # no predecessor
        assert got[(1, 200)] == 100
        assert got[(2, 500)] is None  # singleton group

    def test_running_sum_empty_input(self, spark):
        df = spark.createDataFrame([], "cust long, okey long, price double")
        w = (
            Window.partitionBy("cust")
            .orderBy("okey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        assert df.select(F.sum("price").over(w).alias("s")).collect() == []


class TestSetopEdges:
    def test_union_dedup_collapses_cross_side_dupes(self, spark):
        a = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        b = spark.createDataFrame([(2,), (3,)], "k long")
        got = sorted(r.k for r in a.unionByName(b).dropDuplicates().collect())
        assert got == [1, 2, 3]

    def test_intersect_distinct_and_nulls(self, spark):
        a = spark.createDataFrame([(1,), (1,), (None,), (2,)], "k long")
        b = spark.createDataFrame([(1,), (None,)], "k long")
        got = {r.k for r in a.intersect(b).collect()}
        # SQL INTERSECT is null-matching (unlike joins) and distinct
        assert got == {1, None}

    def test_except_distinct(self, spark):
        a = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k long")
        b = spark.createDataFrame([(2,)], "k long")
        got = {r.k for r in a.subtract(b).collect()}
        assert got == {1, None}

    def test_topk_with_fewer_rows_than_k(self, spark):
        df = spark.createDataFrame([(1, 5.0), (2, 3.0)], "k long, v double")
        got = df.orderBy(F.col("v").desc(), F.col("k")).limit(100).collect()
        assert [r.k for r in got] == [1, 2]


class TestFunnelOrdering:
    def test_out_of_order_events_do_not_count(self, spark):
        """The funnel requires signup <= click <= purchase per user —
        a purchase BEFORE the first qualifying click (or a click
        before signup) must not advance the funnel."""
        from pyspark.sql import functions as F

        rows = [
            # uid 1: proper order -> full funnel
            (1, 1, "signup", 100), (2, 1, "click", 200), (3, 1, "purchase", 300),
            # uid 2: click before signup only -> signup stage only
            (4, 2, "click", 100), (5, 2, "signup", 200),
            # uid 3: purchase before click -> signup+click only
            (6, 3, "signup", 100), (7, 3, "purchase", 150), (8, 3, "click", 200),
            # uid 4: purchase after click -> full funnel even with early noise
            (9, 4, "purchase", 50), (10, 4, "signup", 100),
            (11, 4, "click", 200), (12, 4, "purchase", 250),
        ]
        events = spark.createDataFrame(
            [(e, u, t, ts) for e, u, t, ts in rows],
            "event_id long, user_id long, event_type string, tsec long",
        ).select(
            "event_id", "user_id", "event_type",
            F.timestamp_seconds("tsec").alias("ts"),
        )
        s = (
            events.filter(F.col("event_type") == "signup")
            .groupBy("user_id").agg(F.min("ts").alias("signup_ts"))
        )
        c = (
            events.filter(F.col("event_type") == "click")
            .join(s, "user_id")
            .filter(F.col("ts") >= F.col("signup_ts"))
            .groupBy("user_id").agg(F.min("ts").alias("click_ts"))
        )
        p = (
            events.filter(F.col("event_type") == "purchase")
            .join(c, "user_id")
            .filter(F.col("ts") >= F.col("click_ts"))
            .groupBy("user_id").agg(F.min("ts").alias("purchase_ts"))
        )
        assert s.count() == 4          # all users signed up
        assert set(r.user_id for r in c.collect()) == {1, 3, 4}
        assert set(r.user_id for r in p.collect()) == {1, 4}


class TestScd2Boundary:
    def test_boundary_date_belongs_to_new_version(self, spark, sf_dir, queries=None):
        """Validity intervals are half-open [from, to): an order dated
        exactly on an era boundary must resolve to the NEW version."""
        from pyspark.sql import functions as F

        from etl_8x8_spark.registry import all_queries

        df = all_queries()["join_dim_scd2"].builder(spark, sf_dir)
        # synthesize nothing: assert the rule on whatever boundary
        # orders exist, plus the global invariant every order got
        # EXACTLY one version
        from etl_8x8_spark.sources.readers import load_table

        orders = load_table(spark, sf_dir, "orders")
        assert df.count() == orders.filter(
            (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        ).count()
        boundary = df.join(
            orders.filter(
                F.col("o_orderdate") == F.lit("1995-01-01").cast("timestamp")
            ).select("o_orderkey"),
            "o_orderkey",
        )
        # any boundary-dated order must carry version 1 (the era that
        # STARTS on the boundary), never version 0
        assert boundary.filter(F.col("dim_version") == 0).count() == 0
