"""Round-14 tests: the r13 ADVICE fixes.

1. ``multimodal_resize``'s engine/oracle contract is BYTE-based — the
   engine truncates the UTF-8 byte stream at the 16-byte budget, so
   the oracle must count octets, not code points. The r13 oracle used
   ``ascii()`` per character and only agreed on pure-ASCII fixtures;
   this pins parity on a corpus where multi-byte characters exist AND
   one is split by the byte budget.
2. ``scan_xml``'s fixture synthesis XML-escapes interpolated text, so
   names carrying ``& < >`` survive the round-trip un-corrupted.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from etl_8x8_spark.registry import all_queries

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


class TestResizeByteOracle:
    def test_non_ascii_parity_engine_vs_duckdb(self, spark, tmp_path):
        """Engine and oracle must agree on texts where the UTF-8 byte
        stream diverges from the code-point stream: multi-byte chars
        inside the budget, a multi-byte char SPLIT by the 16-byte cut,
        empty text, and short-ASCII (pad path)."""
        texts = [
            "héllo wörld padding beyond budget",   # 2-byte chars inside
            "世界世界世界世界世界",                  # 3-byte chars, split at 16
            "ascii only but long enough to cut",   # pure-ASCII control
            "ab",                                  # shorter than budget
            "",                                    # empty
            "é" * 8,                               # exactly 16 bytes
        ]
        pdf = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}
        )
        fix_dir = tmp_path / "sfx"
        fix_dir.mkdir()
        pdf.to_parquet(fix_dir / "documents.parquet", index=False)

        spec = all_queries()["multimodal_resize"]
        got = {
            r["doc_id"]: (r["resized_bytes"], r["resized_checksum"])
            for r in spec.builder(spark, str(fix_dir)).collect()
        }

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{fix_dir}/documents.parquet'"
        )
        want = {
            int(doc_id): (int(rb), int(ck))
            for doc_id, rb, ck in con.execute(spec.oracle).fetchall()
        }
        assert got == want

        # and both equal the ground truth computed in plain Python
        for i, t in enumerate(texts):
            b = t[:32].encode("utf-8")[:16]
            assert got[i] == (16, sum(b) % 1_000_000_007), (i, t)


class TestScanXmlEscaping:
    def test_special_chars_survive_roundtrip(self, spark, tmp_path):
        """A supplier name carrying & < > must come back verbatim and
        NOT be routed to _corrupt_record — the fixture writer escapes,
        the StAX parser un-escapes (r13 ADVICE)."""
        pdf = pd.DataFrame(
            {
                "s_suppkey": [1, 2, 41 * 1],  # include one %41 corrupt row
                "s_name": [
                    "Tom & Jerry <Ltd> a>b",
                    "plain name",
                    "also & <plain>",
                ],
                "s_acctbal": [10.5, 20.25, 30.0],
                "s_nationkey": [0, 1, 2],
            }
        )
        # key 41 hits the planted %41 corrupt rule; 1 and 2 must parse
        fix_dir = tmp_path / "sfy"
        fix_dir.mkdir()
        pdf.to_parquet(fix_dir / "supplier.parquet", index=False)

        rows = {
            r["s_suppkey"]: r
            for r in all_queries()["scan_xml"]
            .builder(spark, str(fix_dir))
            .collect()
        }
        assert rows[1]["s_name"] == "Tom & Jerry <Ltd> a>b"
        assert not rows[1]["is_corrupt"]
        assert rows[1]["s_acctbal"] == 10.5
        assert rows[2]["s_name"] == "plain name"
        assert not rows[2]["is_corrupt"]
        assert rows[41]["is_corrupt"]  # the planted rule, not escaping
