"""Crash-consistency tests for the transaction-log protocol (r11
verdict item 6) — the durability half that was previously asserted in
prose only (LESSONS #44).

The protocol (sink_txn_log_commit, and cdc_stream_apply's per-batch
apply since r12): data files are immutable; table state is the fold of
an ordered log of {adds, removes}; a commit becomes visible via ONE
atomic rename of its log record from ``*.json.tmp`` to ``*.json``.

Crash model under test:
- writer dies AFTER writing data files but BEFORE the log rename →
  the data files and the ``.tmp`` record are on disk, but a reader
  must serve exactly the last committed snapshot (orphans invisible);
- a visible-but-torn ``*.json`` cannot be produced by the protocol
  (rename is atomic), so if one IS found the reader must fail stop
  rather than silently serve a partial state.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from etl_8x8_spark.registry import all_queries
from etl_8x8_spark.sources.readers import scratch_dir
from etl_8x8_spark.sources.scans import _src_tag

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark):
    q = all_queries()["sink_txn_log_commit"]
    return sorted(
        tuple(r) for r in q.builder(spark, SF_DIR).collect()
    )


def _base() -> str:
    return os.path.join(
        scratch_dir(), f"txnlog_{_src_tag(SF_DIR, 'orders')}"
    )


class TestTxnLogCrashConsistency:
    def test_uncommitted_write_is_invisible(self, spark):
        """Writer death between data-file write and log rename: the
        orphaned data dir and the half-written .tmp record must not
        change what a reader serves."""
        committed = _run(spark)  # builds + commits 3 versions
        base = _base()
        log_dir = os.path.join(base, "_log")
        # simulate the dying writer: a fourth data dir fully written...
        orphan = os.path.join(base, "dataD")
        if os.path.exists(orphan):
            shutil.rmtree(orphan)
        shutil.copytree(os.path.join(base, "dataC"), orphan)
        # ...and its commit record only half-flushed, never renamed
        tmp = os.path.join(log_dir, "00003.json.tmp")
        with open(tmp, "w") as f:
            f.write('{"adds": ["dataD"], "rem')  # torn mid-write
        try:
            assert _run(spark) == committed  # last committed snapshot
        finally:
            os.remove(tmp)
            shutil.rmtree(orphan)

    def test_reader_replays_to_compacted_state(self, spark):
        """The fold must end at {dataC}: a reader that still sees the
        removed dataA/dataB (or misses dataC) is serving a snapshot
        that never existed."""
        _run(spark)
        base = _base()
        live: list[str] = []
        log_dir = os.path.join(base, "_log")
        for name in sorted(os.listdir(log_dir)):
            if name.endswith(".json"):
                rec = json.load(open(os.path.join(log_dir, name)))
                for r in rec["removes"]:
                    live.remove(r)
                live.extend(rec["adds"])
        assert live == ["dataC"]

    def test_torn_visible_record_fails_stop(self, spark):
        """A torn *.json is impossible under the protocol (the rename
        is atomic); if one exists the reader must raise, not fold a
        partial log into a snapshot that never existed."""
        _run(spark)
        torn = os.path.join(_base(), "_log", "00003.json")
        with open(torn, "w") as f:
            f.write('{"adds": ["dataD"], "rem')
        try:
            with pytest.raises(Exception):
                _run(spark)
        finally:
            os.remove(torn)
        # and the reader recovers once the torn record is gone
        assert len(_run(spark)) > 0


class TestCdcStreamLogConsistency:
    def test_every_log_prefix_is_a_valid_snapshot(self, spark):
        """cdc_stream_apply (txn-log rebased in r12): folding ANY
        prefix of the commit log must yield a readable, complete
        table — the before-or-after guarantee per batch. Version 0 is
        the bulk load (all rows); later snapshots change monotonically
        by the applied deltas, and bucket files referenced by each
        prefix must all exist (immutability: removes never delete)."""
        q = all_queries()["cdc_stream_apply"]
        final_n = q.builder(spark, SF_DIR).count()
        sf_tag = os.path.basename(SF_DIR.rstrip("/")) or "sf"
        base = os.path.join(scratch_dir(), f"cdc_stream_{sf_tag}")
        log_dir = os.path.join(base, "_log")
        data = os.path.join(base, "data")
        recs = [
            json.load(open(os.path.join(log_dir, n)))
            for n in sorted(os.listdir(log_dir))
            if n.endswith(".json")
        ]
        assert len(recs) == 4  # bulk load + 3 micro-batches
        live: list[str] = []
        counts = []
        for rec in recs:
            for r in rec["removes"]:
                live.remove(r)
            live.extend(rec["adds"])
            paths = [os.path.join(data, p) for p in live]
            assert all(os.path.isdir(p) for p in paths)  # immutable
            counts.append(spark.read.parquet(*paths).count())
        assert counts[-1] == final_n
        # v0 = table; v1 adds inserts; v2 row-neutral updates;
        # v3 shrinks by the deletes
        assert counts[1] > counts[0]
        assert counts[2] == counts[1]
        assert counts[3] < counts[2]


class TestTimeTravel:
    def test_versions_are_the_planted_states(self, spark):
        """v0 = evens only, v1 = whole table, v2 = v1 minus the
        mod-10 deletes — and no state leaks across versions."""
        rows = {
            r["version"]: r
            for r in all_queries()["scan_txn_log_time_travel"]
            .builder(spark, SF_DIR)
            .collect()
        }
        assert sorted(rows) == [0, 1, 2]
        assert rows[0]["n"] < rows[1]["n"]  # evens ⊂ all
        assert rows[2]["n"] < rows[1]["n"]  # deletes shrink
        # v2 must still contain the even non-mod-10 keys from v0
        assert rows[2]["n"] > rows[0]["n"] // 2
