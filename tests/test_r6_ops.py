"""Round-6 behavioral pins.

TestWatermarkDropKeepProperty: the two-directional late-data property
the round-5 verdict asked for — `stream_watermark_late_data` is the
registry's single rows-only key (no batch-SQL twin), so its drop/keep
semantics get a CONTROLLED-event-time behavioral pin instead: a late
row whose window was finalized below the watermark must be DROPPED,
and a late-but-inside-lateness row must be KEPT, with the event times
injected explicitly (not sampled from the events table).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from etl_8x8_spark.session import get_spark

    return get_spark("test-r6", cpus=4, shuffle_partitions=4)


class TestWatermarkDropKeepProperty:
    """Controlled two-phase file stream, 1-hour tumbling windows,
    10-minute watermark delay.

    Phase 1 rows (event times):   10:05, 10:20, 13:59
      -> watermark after phase 1 = 13:59 - 10 min = 13:49; the
         10:00-11:00 window (end 11:00 <= 13:49) finalizes with
         count 2 and its state is evicted.
    Phase 2 rows:                 10:30, 13:50, 15:59
      - 10:30 belongs to the EVICTED 10:00 window  -> must be DROPPED
      - 13:50 belongs to the LIVE 13:00 window
        (end 14:00 > 13:49)                        -> must be KEPT
      - 15:59 advances the watermark to 15:49, finalizing the 13:00
        window at count 2 (13:59 + the kept 13:50).
    Phase 3 row:                  18:59
      -> watermark 18:49 finalizes the 15:00 window (count 1); the
         18:00 window stays open and must NOT be emitted.
    """

    _SCHEMA = "ts timestamp, k string"

    def _run_phase(self, spark, rows, in_dir, out_dir, ckpt):
        df = spark.createDataFrame(
            [(t, "e") for t in rows], "ts string, k string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("append").parquet(in_dir)
        agg = (
            spark.readStream.schema(self._SCHEMA)
            .parquet(in_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format("window.start", "HH:mm").alias("ws"),
                "n",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_drop_below_watermark_keep_inside_lateness(self, spark, tmp_path):
        base = str(tmp_path / "wm_prop")
        in_dir, out_dir, ckpt = (
            os.path.join(base, d) for d in ("in", "out", "ckpt")
        )
        for d in (in_dir, out_dir, ckpt):
            if os.path.exists(d):
                shutil.rmtree(d)
        day = "2024-01-01 "
        self._run_phase(
            spark,
            [day + "10:05:00", day + "10:20:00", day + "13:59:00"],
            in_dir, out_dir, ckpt,
        )
        self._run_phase(
            spark,
            [day + "10:30:00", day + "13:50:00", day + "15:59:00"],
            in_dir, out_dir, ckpt,
        )
        self._run_phase(spark, [day + "18:59:00"], in_dir, out_dir, ckpt)

        got = {
            r.ws: r.n for r in spark.read.parquet(out_dir).collect()
        }
        # direction 1: the 10:30 row fell below the watermark after its
        # window was finalized -> dropped; the window stays at 2.
        assert got.get("10:00") == 2, (
            f"late row below watermark leaked (or window lost): {got}"
        )
        # direction 2: the 13:50 row arrived while its window's state
        # was still live -> kept; the window finalizes at 2.
        assert got.get("13:00") == 2, (
            f"inside-lateness row was not kept: {got}"
        )
        # the 15:00 window finalized by phase 3's watermark
        assert got.get("15:00") == 1, got
        # the still-open 18:00 window must not be emitted in append mode
        assert "18:00" not in got, got
