"""Property-based tests (hypothesis): the as-of window pattern against
a brute-force reference, and partitioned-sink roundtrip integrity.

Example counts are kept small — every example runs real Spark jobs —
but the generators cover the adversarial structure (timestamp ties,
users with no clicks, click-after-purchase) that fixed fixtures miss.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.integers(min_value=0, max_value=10),  # ts (coarse -> many ties)
        st.booleans(),  # is_purchase
    ),
    min_size=0,
    max_size=20,
)


def _asof_spark(spark, rows):
    df = spark.createDataFrame(
        [
            (i, int(uid), int(ts), "purchase" if p else "click")
            for i, (uid, ts, p) in enumerate(rows)
        ],
        "event_id long, user_id long, ts long, event_type string",
    )
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
    return {
        r.purchase_id: r.last_click_id
        for r in clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("purchase_id").isNotNull())
        .collect()
    }


def _asof_brute(rows):
    out = {}
    for i, (uid, ts, is_p) in enumerate(rows):
        if not is_p:
            continue
        candidates = [
            (cts, j)
            for j, (cuid, cts, cp) in enumerate(rows)
            if not cp and cuid == uid and cts <= ts
        ]
        out[i] = max(candidates)[1] if candidates else None
    return out


class TestAsofProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=events_strategy)
    def test_union_window_asof_equals_brute_force(self, spark, rows):
        assert _asof_spark(spark, rows) == _asof_brute(rows)


class TestSinkRoundtripProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1_000_000),
                st.sampled_from(["alpha", "beta", "gamma"]),  # partition col
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=30,
        ),
        files_per_partition=st.sampled_from([1, 3]),
    )
    def test_partitioned_write_preserves_rows(
        self, spark, rows, files_per_partition
    ):
        from etl_8x8_spark.sources.readers import scratch_dir
        from etl_8x8_spark.sources.sinks import write_parquet_partitioned

        df = spark.createDataFrame(rows, "k long, part string, v double")
        path = os.path.join(scratch_dir(), "prop_sink")
        write_parquet_partitioned(
            df, path, ["part"], files_per_partition=files_per_partition
        )
        back = spark.read.parquet(path)
        assert sorted(
            (r.k, r.part, r.v) for r in back.collect()
        ) == sorted(rows)
