"""Round-15 operator tests: deletion vectors (merge-on-read DELETE),
their CDF interaction, and the schema-evolution reader's generation-
grouped scan plan.

The DV tests pin the two properties that make merge-on-read real:
the data file's bytes still HOLD the deleted rows (nothing was
rewritten — the vector is applied at scan), and the change feed for a
DV commit emits exactly the newly-deleted rows even though the commit
adds/removes no files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries
from etl_8x8_spark.sources.readers import load_table, scratch_dir


def _dv_base(sf_dir: str) -> str:
    from etl_8x8_spark.sources.scans import _src_tag

    return os.path.join(scratch_dir(), f"txndv_{_src_tag(sf_dir, 'orders')}")


@pytest.fixture(scope="module")
def dv_table(spark, sf_dir):
    """Build the DV table once; return (result_rows, base, log_dir)."""
    q = all_queries()["sink_txn_log_delete_vectors"]
    rows = {r.version: (r.n, r.sum_price) for r in q.builder(spark, sf_dir).collect()}
    base = _dv_base(sf_dir)
    return rows, base, os.path.join(base, "_log")


def test_dv_versioned_snapshots(spark, sf_dir, dv_table):
    rows, _, _ = dv_table
    orders = load_table(spark, sf_dir, "orders")
    n1 = orders.count()
    n2 = orders.filter(F.col("o_orderkey") % 7 != 0).count()
    n3 = orders.filter(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 11 != 0)
    ).count()
    assert rows[1][0] == n1
    assert rows[2][0] == n2 < n1
    assert rows[3][0] == n3 < n2
    # compaction is semantics-preserving: v4 == v3 exactly
    assert rows[4] == rows[3]


def test_dv_file_bytes_never_rewritten(spark, sf_dir, dv_table):
    """The merge-on-read pin: the RAW data files still hold every
    deleted key — only the scan-time vector hides them."""
    _, base, _ = dv_table
    raw_a = spark.read.parquet(os.path.join(base, "fileA"))
    raw_b = spark.read.parquet(os.path.join(base, "fileB"))
    # deleted keys are still physically present in both originals
    assert raw_a.filter(F.col("o_orderkey") % 7 == 0).count() > 0
    assert raw_b.filter(F.col("o_orderkey") % 7 == 0).count() > 0
    assert raw_b.filter(F.col("o_orderkey") % 11 == 0).count() > 0
    # the compacted file, by contrast, scans plain — vector folded in
    raw_c = spark.read.parquet(os.path.join(base, "fileA_c"))
    assert (
        raw_c.filter(
            (F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 11 == 0)
        ).count()
        == 0
    )


def test_dv_replacement_not_stacking(spark, sf_dir, dv_table):
    """v3's vector for fileB must CONTAIN v2's positions (old ∪ new):
    readers consult exactly one vector per file, never a stack."""
    _, base, _ = dv_table
    v2 = spark.read.parquet(os.path.join(base, "dv", "v00002_fileB"))
    v3 = spark.read.parquet(os.path.join(base, "dv", "v00003_fileB"))
    assert v3.count() > v2.count()
    assert v2.join(v3, ["_fp", "_ri"], "left_anti").count() == 0


def test_dv_cdf_emits_newly_deleted_only(spark, sf_dir, dv_table):
    """CDF interaction: the DV commit's feed is the newly-deleted rows
    — v2 emits keys ≡ 0 (mod 7); v3 emits keys ≡ 0 (mod 11) that were
    NOT already dead under the v2 vector."""
    from etl_8x8_spark.sources.scans import _dv_cdf_deletes

    _, base, log_dir = dv_table
    orders = load_table(spark, sf_dir, "orders")

    feed2 = _dv_cdf_deletes(spark, base, log_dir, 2)
    assert feed2.columns == [
        "o_orderkey",
        "_change_type",
        "_commit_version",
        "o_totalprice",
    ]
    got2 = {r.o_orderkey for r in feed2.collect()}
    want2 = {
        r.o_orderkey
        for r in orders.filter(F.col("o_orderkey") % 7 == 0).collect()
    }
    assert got2 == want2

    feed3 = _dv_cdf_deletes(spark, base, log_dir, 3).collect()
    got3 = {r.o_orderkey for r in feed3}
    want3 = {
        r.o_orderkey
        for r in orders.filter(
            (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 7 != 0)
        ).collect()
    }
    assert got3 == want3
    assert all(r._change_type == "delete" for r in feed3)
    assert all(r._commit_version == 3 for r in feed3)


# ---------------------------------------------------------------------------
# column mapping (RENAME/DROP as log metadata)
# ---------------------------------------------------------------------------


def _colmap_base(sf_dir: str) -> str:
    from etl_8x8_spark.sources.scans import _src_tag

    return os.path.join(
        scratch_dir(), f"txncolmap_{_src_tag(sf_dir, 'orders')}"
    )


def test_column_mapping_read(spark, sf_dir):
    q = all_queries()["sink_txn_log_column_mapping"]
    got = {r.bucket: (r.n, r.sum_price) for r in q.builder(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    extra = orders.filter(F.col("o_orderkey") % 25 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"), "o_totalprice"
    )
    want = {
        r.bucket: r.n
        for r in orders.select("o_orderkey", "o_totalprice")
        .unionByName(extra)
        .groupBy((F.col("o_orderkey") % 5).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {b: n for b, (n, _) in got.items()} == want


def test_column_mapping_drop_survives_in_file_not_in_read(spark, sf_dir):
    """DROP is metadata: the dropped column's BYTES are still in every
    pre-drop file; the read surface no longer has it — and the RENAME
    is invisible to physical writers (f2 still writes col_2)."""
    all_queries()["sink_txn_log_column_mapping"].builder(spark, sf_dir)
    base = _colmap_base(sf_dir)
    raw_f1 = spark.read.parquet(os.path.join(base, "f1"))
    assert raw_f1.columns == ["col_1", "col_2", "col_3"]
    assert raw_f1.filter(F.col("col_3").isNotNull()).count() > 0
    # the post-drop file stopped writing the dropped physical column
    raw_f3 = spark.read.parquet(os.path.join(base, "f3"))
    assert raw_f3.columns == ["col_1", "col_2"]
    # the log's latest schema has no col_3 mapping: reads can't see it
    import json

    log_dir = os.path.join(base, "_log")
    schema = []
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json"):
            rec = json.load(open(os.path.join(log_dir, name)))
            if "schema" in rec:
                schema = rec["schema"]
    assert [e[1] for e in schema] == ["o_orderkey", "price"]


# ---------------------------------------------------------------------------
# avro container codec + DataSource scan
# ---------------------------------------------------------------------------


def test_avro_codec_roundtrip(tmp_path):
    from etl_8x8_spark.sources.avro_source import (
        read_container,
        write_container,
    )

    fields = [("k", "long"), ("s", "string"), ("x", "double")]
    recs = [(i, f"row_{i}·", i * 0.5) for i in range(-3, 1000)]
    p = str(tmp_path / "t.avro")
    write_container(p, fields, recs, records_per_block=100)
    got, flags = [], []
    for block, ok in read_container(p, fields):
        got.extend(block)
        flags.append(ok)
    assert got == recs
    assert all(flags) and len(flags) == 11  # 1003 rows / 100 per block


def test_avro_torn_tail_recovers_prefix(tmp_path):
    from etl_8x8_spark.sources.avro_source import (
        read_container,
        write_container,
    )

    fields = [("k", "long"), ("s", "string"), ("x", "double")]
    recs = [(i, f"r{i}", float(i)) for i in range(200)]
    p = str(tmp_path / "torn.avro")
    write_container(p, fields, recs, records_per_block=100)
    with open(p, "rb+") as fh:
        fh.seek(0, os.SEEK_END)
        fh.truncate(fh.tell() - 8)  # tear into the last block's sync
    blocks = list(read_container(p, fields))
    assert [ok for _, ok in blocks] == [True, False]
    assert [r for b, _ in blocks for r in b] == recs[:100]


def test_avro_bad_header_raises(tmp_path):
    from etl_8x8_spark.sources.avro_source import read_container

    p = str(tmp_path / "junk.avro")
    with open(p, "wb") as fh:
        fh.write(b"PAR1 definitely not avro")
    with pytest.raises(ValueError):
        list(read_container(p, [("k", "long")]))


def test_scan_avro_recovers_good_block_only(spark, sf_dir):
    df = all_queries()["scan_avro"].builder(spark, sf_dir)
    rows = df.collect()
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_good = orders.filter(F.col("o_orderkey") % 50 == 0).count()
    assert sum(r.n for r in rows) == n_orders + n_good
    # the n_recovered marker is key<0; key 0 negates to itself, so the
    # testdata's single o_orderkey=0 row is recovered but unmarked —
    # operator and oracle share the same rule, so the hash still pins it
    n_marked = orders.filter(
        (F.col("o_orderkey") % 50 == 0) & (F.col("o_orderkey") > 0)
    ).count()
    assert sum(r.n_recovered for r in rows) == n_marked
