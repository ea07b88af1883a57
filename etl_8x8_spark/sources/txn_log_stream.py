"""Streaming source over the transaction-log table (r14) — the Delta
streaming-source shape: the stream's OFFSET is the log version, each
micro-batch serves the commits that landed since the last checkpoint,
and the rows of a batch are exactly the rows the new commits ADDED.

Unlike the paginated-API demo source (``custom_source.py``, a
``SimpleDataSourceStreamReader`` whose rows flow through the driver),
this is the FULL ``DataSourceStreamReader``: ``partitions(start, end)``
returns one :class:`InputPartition` per (commit, added file) and
``read(partition)`` runs ON EXECUTORS, streaming each file's Arrow
record batches straight into Spark — file-level parallelism identical
to a parquet scan, which is what makes the source viable when a single
commit adds terabytes. The driver only ever touches metadata: the log
listing (``latestOffset``) and the commit records (``partitions``).

Offsets are throttled to ONE commit per micro-batch (``latestOffset``
advances a single version per poll) so state and recovery granularity
are bounded by commits-per-batch, and a checkpoint restart replays
from a version boundary — the ``maxFilesPerTrigger`` discipline of
real lakehouse streaming sources.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = "o_orderkey bigint, o_totalprice double, version bigint"


class _CommitFile(InputPartition):
    def __init__(self, version: int, path: str) -> None:
        self.version = version
        self.path = path


def _committed_versions(log_dir: str) -> list[int]:
    return sorted(
        int(n.split(".")[0])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n.split(".")[0].isdigit()
    )


class TxnLogTailReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.base = options["path"]
        self.log_dir = os.path.join(self.base, "_log")

    # -- offsets: {"version": N} == "commits < N consumed" ------------
    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        # throttle: advance ONE commit per micro-batch so a batch's
        # state is bounded by a single commit's adds however long the
        # backlog is (processAllAvailable still drains everything)
        versions = _committed_versions(self.log_dir)
        if not versions:
            return {"version": 0}
        top = versions[-1] + 1
        # current high-water mark is tracked by Spark; we expose one
        # more version per poll by reading our own progress file-free
        # contract: latestOffset may overshoot safely, but one-at-a-
        # time keeps batches commit-aligned, so remember the last
        # answer on the reader instance (fresh per query start)
        prev = getattr(self, "_served", 0)
        nxt = min(prev + 1, top)
        self._served = nxt
        return {"version": nxt}

    def partitions(self, start: dict, end: dict):
        parts: list[_CommitFile] = []
        for v in range(start["version"], end["version"]):
            rec = json.load(
                open(os.path.join(self.log_dir, f"{v:05d}.json"))
            )
            for add in rec["adds"]:
                path = add["path"] if isinstance(add, dict) else add
                parts.append(
                    _CommitFile(v, os.path.join(self.base, path))
                )
        # an empty batch still needs ≥0 partitions; Spark handles []
        return parts

    def read(self, partition: _CommitFile):
        # EXECUTOR-side: stream the file's Arrow batches directly —
        # no per-row Python, no driver hop
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = sorted(
            os.path.join(partition.path, f)
            for f in os.listdir(partition.path)
            if f.endswith(".parquet")
        )
        for f in files:
            for batch in pq.ParquetFile(f).iter_batches(
                columns=["o_orderkey", "o_totalprice"]
            ):
                n = batch.num_rows
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(0).cast(pa.int64()),
                        batch.column(1).cast(pa.float64()),
                        pa.array([partition.version] * n, pa.int64()),
                    ],
                    names=["o_orderkey", "o_totalprice", "version"],
                )

    def commit(self, end: dict) -> None:
        # offsets are durable in Spark's checkpoint; the source itself
        # is stateless (the log IS the state)
        pass


class TxnLogTailSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txn_log_tail"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> TxnLogTailReader:
        return TxnLogTailReader(self.options)


def register_txn_log_tail_source(spark) -> None:
    """Idempotent registration (per-session)."""
    key = "_txn_log_tail_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(TxnLogTailSource)
        setattr(spark, key, True)
