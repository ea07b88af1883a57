"""Edge-row tests for the scalar-function families, multimodal decode
plumbing, and window frame boundaries (SURVEY.md §5 — the cheap
families otherwise lean entirely on the DuckDB oracle, which only sees
the rows the test tables contain; these pin null / empty / boundary
semantics the tables never exercise).

All inputs are in-memory DataFrames so the corner rows are explicit.
The session runs ANSI mode (pyspark 4.x default) — the semantics
asserted here are the ANSI ones the engine actually ships with.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


class TestStringEdges:
    def test_null_input_propagates(self, spark):
        df = spark.createDataFrame([(None,)], "s STRING")
        row = df.select(
            F.lower("s").alias("lo"),
            F.substring("s", 1, 8).alias("sub"),
            F.length("s").alias("ln"),
            F.trim(F.col("s")).alias("tr"),
        ).collect()[0]
        assert (row.lo, row.sub, row.ln, row.tr) == (None, None, None, None)

    def test_concat_ws_skips_nulls(self, spark):
        df = spark.createDataFrame([("b",)], "s STRING")
        row = df.select(
            F.concat_ws("#", F.lit(None).cast("string"), "s").alias("j")
        ).collect()[0]
        # concat_ws drops null args entirely — no leading separator
        assert row.j == "b"

    def test_empty_string(self, spark):
        df = spark.createDataFrame([("",)], "s STRING")
        row = df.select(
            F.length("s").alias("ln"),
            F.substring("s", 1, 8).alias("sub"),
            F.element_at(F.split("s", " "), 1).alias("first_word"),
            F.lpad("s", 4, "0").alias("pad"),
        ).collect()[0]
        # split('') is [''] (one empty token), so first_word is ''
        assert (row.ln, row.sub, row.first_word, row.pad) == (0, "", "", "0000")

    def test_regexp_extract_no_match_is_empty_not_null(self, spark):
        df = spark.createDataFrame([("xyz",)], "s STRING")
        row = df.select(
            F.regexp_extract("s", r"^(\d+)", 1).alias("m")
        ).collect()[0]
        assert row.m == ""


class TestUrlEdges:
    def test_parse_url_without_query(self, spark):
        df = spark.createDataFrame(
            [("https://shop.example.com/part/1",)], "url STRING"
        )
        row = df.select(
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("type")).alias("p"),
        ).collect()[0]
        assert row.host == "shop.example.com"
        assert row.query is None and row.p is None

    def test_parse_url_param_selection(self, spark):
        df = spark.createDataFrame(
            [("https://h/p?type=a+b&size=4&type=zz",)], "url STRING"
        )
        row = df.select(
            F.parse_url("url", F.lit("QUERY"), F.lit("type")).alias("t"),
            F.parse_url("url", F.lit("QUERY"), F.lit("size")).alias("s"),
            F.parse_url("url", F.lit("QUERY"), F.lit("absent")).alias("a"),
        ).collect()[0]
        # repeated key: first occurrence wins; missing key: null
        assert (row.t, row.s, row.a) == ("a+b", "4", None)


class TestEncodeDecodeEdges:
    @pytest.mark.parametrize("text", ["", "naïve — ünïcode ✓"])
    def test_base64_roundtrip(self, spark, text):
        df = spark.createDataFrame([(text,)], "s STRING")
        row = df.select(
            F.decode(F.unbase64(F.base64(F.encode("s", "utf-8"))), "utf-8").alias(
                "rt"
            )
        ).collect()[0]
        assert row.rt == text

    def test_digests_of_empty_string_are_defined(self, spark):
        df = spark.createDataFrame([("",)], "s STRING")
        row = df.select(
            F.md5(F.encode("s", "utf-8")).alias("m"),
            F.sha2(F.encode("s", "utf-8"), 256).alias("h"),
        ).collect()[0]
        assert row.m == "d41d8cd98f00b204e9800998ecf8427e"
        assert row.h == (
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
        )


class TestFormatEdges:
    def test_format_negative_and_zero_padding(self, spark):
        df = spark.createDataFrame([(-5, 0.0)], "k INT, b DOUBLE")
        row = df.select(
            F.format_string("%08d", "k").alias("pad"),
            F.format_string("%.2f", "b").alias("flt"),
            F.lpad(F.col("k").cast("string"), 6, "0").alias("lp"),
        ).collect()[0]
        # printf pads within the width incl. sign; lpad pads the
        # rendered string blindly (sign ends up inside the zeros)
        assert (row.pad, row.flt, row.lp) == ("-0000005", "0.00", "0000-5")


class TestBitwiseEdges:
    def test_negative_operands(self, spark):
        df = spark.createDataFrame([(-8,)], "k BIGINT")
        row = df.select(
            F.shiftright(F.col("k"), 1).alias("sr"),
            F.bit_count(F.lit(-1).cast("long")).alias("pc_allones"),
            F.col("k").bitwiseAND(F.lit(255)).alias("low"),
        ).collect()[0]
        # shiftright is ARITHMETIC (sign-extending); -8 & 255 is the
        # low byte of the two's-complement pattern, not a negative
        assert (row.sr, row.pc_allones, row.low) == (-4, 64, 248)


class TestJsonEdges:
    def test_malformed_json_yields_null_and_invalid(self, spark):
        df = spark.createDataFrame([("not json",)], "props STRING")
        row = df.select(
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", "k INT")["k"].alias("k_int"),
            # the fn_json is_valid expression: '$' probe, NOT
            # from_json(...).isNotNull() — PERMISSIVE from_json yields
            # a struct of nulls (never a null struct) on bad input
            F.get_json_object("props", "$").isNotNull().alias("is_valid"),
            F.from_json("props", "k INT").isNotNull().alias("permissive_trap"),
        ).collect()[0]
        assert (row.k_str, row.k_int, row.is_valid) == (None, None, False)
        # document the trap this test exists to prevent regressing into
        assert row.permissive_trap is True

    def test_missing_key_is_null_but_doc_valid(self, spark):
        df = spark.createDataFrame([('{"a": 1}',)], "props STRING")
        row = df.select(
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$").isNotNull().alias("is_valid"),
        ).collect()[0]
        assert row.k_str is None and row.is_valid is True


class TestArrayMapEdges:
    def test_empty_array(self, spark):
        df = spark.createDataFrame([([],)], "e ARRAY<DOUBLE>")
        row = df.select(
            F.size("e").alias("dim"),
            F.array_max("e").alias("mx"),
            F.aggregate("e", F.lit(0.0), lambda a, b: a + b).alias("s"),
            F.concat_ws(
                ",", F.transform("e", lambda x: x.cast("string"))
            ).alias("head"),
        ).collect()[0]
        # fold over empty = the init value; max of empty = null
        assert (row.dim, row.mx, row.s, row.head) == (0, None, 0.0, "")

    def test_map_missing_key_null_under_ansi(self, spark):
        df = spark.createDataFrame([(1,)], "a INT")
        m = F.create_map(F.lit("x"), F.lit(1))
        row = df.select(
            F.element_at(m, "absent").alias("miss"),
            F.coalesce(F.element_at(m, "absent"), F.lit(9)).alias("dflt"),
        ).collect()[0]
        assert row.miss is None and row.dflt == 9

    def test_map_concat_right_side_wins_after_filter(self, spark):
        # the fn_map merge idiom: drop overlapping keys, then concat
        df = spark.createDataFrame([(1,)], "a INT")
        base = F.create_map(F.lit("k"), F.lit("old"), F.lit("u"), F.lit("1"))
        extra = F.create_map(F.lit("k"), F.lit("new"))
        merged = F.map_concat(
            F.map_filter(base, lambda k, _: ~F.map_contains_key(extra, k)),
            extra,
        )
        row = df.select(
            F.element_at(merged, "k").alias("k"),
            F.size(merged).alias("n"),
        ).collect()[0]
        assert (row.k, row.n) == ("new", 2)


class TestMultimodalEdges:
    def test_decode_empty_payload(self):
        from etl_8x8_spark.operators.multimodal import _decode_payload

        assert _decode_payload(b"") == (0, 0, 0)

    def test_decode_batch_handles_empty_payload_rows(self, spark):
        from etl_8x8_spark.operators.multimodal import (
            _DECODE_SCHEMA,
            decode_media_batch,
        )

        pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"", b"\x10\x20"]})
        out = list(decode_media_batch(iter([pdf])))[0]
        assert list(out.columns) == [f.name for f in _DECODE_SCHEMA.fields]
        empty, full = out.iloc[0], out.iloc[1]
        assert (empty.n_bytes, empty.fake_width, empty.fake_height) == (0, 0, 0)
        assert full.n_bytes == 2 and full.checksum == 0x10 + 0x20

    def test_map_in_pandas_empty_partition_keeps_schema(self, spark):
        from etl_8x8_spark.operators.multimodal import (
            _DECODE_SCHEMA,
            decode_media_batch,
        )

        df = spark.createDataFrame([], "doc_id LONG, payload BINARY")
        out = df.mapInPandas(decode_media_batch, _DECODE_SCHEMA)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            f.name for f in _DECODE_SCHEMA.fields
        ]


class TestWindowFrameBoundaries:
    def _trailing(self, spark, rows):
        from etl_8x8_spark.operators.windows import _TRAIL_US

        df = spark.createDataFrame(rows, "cust INT, oid INT, d DATE, p DOUBLE")
        epoch_us = F.unix_micros(F.col("d").cast("timestamp"))
        w = (
            Window.partitionBy("cust")
            .orderBy(epoch_us)
            .rangeBetween(-_TRAIL_US, Window.currentRow)
        )
        return {
            r.oid: (r.spend, r.n)
            for r in df.select(
                "oid",
                F.sum("p").over(w).alias("spend"),
                F.count(F.lit(1)).over(w).alias("n"),
            ).collect()
        }

    def test_range_peers_share_one_frame(self, spark):
        import datetime as dt

        d = dt.date(2024, 6, 1)
        got = self._trailing(
            spark,
            [(1, 1, d, 10.0), (1, 2, d, 20.0)],
        )
        # RANGE frames are peer-inclusive: same order-key rows see each
        # other regardless of row order (a ROWS frame would not)
        assert got[1] == (30.0, 2) and got[2] == (30.0, 2)

    def test_range_boundary_inclusive_at_exactly_30_days(self, spark):
        import datetime as dt

        cur = dt.date(2024, 6, 1)
        included = cur - dt.timedelta(days=30)  # == frame lower bound
        excluded = cur - dt.timedelta(days=31)
        got = self._trailing(
            spark,
            [(1, 1, excluded, 1.0), (1, 2, included, 2.0), (1, 3, cur, 4.0)],
        )
        # the 30-days-ago row is inside the frame (bound is inclusive),
        # the 31-days-ago row is not
        assert got[3] == (6.0, 2)

    def test_sessionize_gap_exactly_at_threshold_starts_new_session(
        self, spark
    ):
        import datetime as dt

        from etl_8x8_spark.operators.windows import _SESSION_GAP_US

        t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
        at_gap = t0 + dt.timedelta(microseconds=_SESSION_GAP_US)
        under_gap = at_gap + dt.timedelta(microseconds=_SESSION_GAP_US - 1)
        df = spark.createDataFrame(
            [(1, 100, t0), (2, 100, at_gap), (3, 100, under_gap)],
            "event_id INT, user_id INT, ts TIMESTAMP",
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        us = F.unix_micros(F.col("ts"))
        prev = F.lag(us).over(w)
        new_s = F.when(prev.isNull() | (us - prev >= _SESSION_GAP_US), 1).otherwise(0)
        got = {
            r.event_id: r.seq
            for r in df.select(
                "event_id", F.sum(new_s).over(wcum).alias("seq")
            ).collect()
        }
        # gap == threshold starts a NEW session (>=, matching the
        # oracle); anything under the threshold continues the session
        assert got == {1: 1, 2: 2, 3: 2}
