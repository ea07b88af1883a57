"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic "greeting API" source, the batch analog of the
reference's request/response surface (``/root/reference/src/
handlers.py:21-33`` — name in, greeting out) exposed as a partitioned,
parallel-scannable table.

This is the engine's template for wrapping ANY external record service
(REST pages, a message queue, a proprietary store) as a first-class
Spark relation: implement ``partitions()`` so the work splits into
independent units (here: contiguous id ranges; for a real API,
page/shard tokens), and ``read(partition)`` yielding tuples for one
unit. Spark schedules one task per partition — the source scales out
exactly like a file scan, and downstream operators (joins, aggs)
neither know nor care that rows came from Python.

Determinism contract: row content is a pure function of the id, so the
DuckDB oracle regenerates the identical relation from ``range()``
arithmetic and the whole scan is value-hash-verified.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class GreetingApiReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        return [
            _IdRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IdRange):
        # pure function of id -> reproducible in SQL; a real connector
        # would page through its shard of the remote service here
        for i in range(partition.start, partition.end):
            name = f"user_{i}"
            yield (i, name, f"Hello, {name}!", i % 7)


class GreetingApiSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "greeting_api"

    def schema(self) -> str:
        return "id bigint, name string, greeting string, shard int"

    def reader(self, schema) -> GreetingApiReader:
        return GreetingApiReader(self.options)

    def simpleStreamReader(self, schema) -> "GreetingApiStreamReader":
        return GreetingApiStreamReader(self.options)


def register_greeting_source(spark) -> None:
    """Idempotent registration (per-session)."""
    key = "_greeting_api_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(GreetingApiSource)
        setattr(spark, key, True)


class GreetingApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic relation: the
    offset is just the next unread id, each poll serves a bounded page
    (the shape of tailing a paginated API / queue). ``initialOffset``
    → 0; ``read(start)`` returns (rows, nextOffset); Spark checkpoints
    offsets, so restarts resume exactly — the connector itself is
    stateless."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.page = int(options.get("page", 250))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.page, self.n_rows)
        rows = [
            (i, f"user_{i}", f"Hello, user_{i}!", i % 7) for i in range(lo, hi)
        ]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, f"user_{i}", f"Hello, user_{i}!", i % 7)
            for i in range(start["next"], end["next"])
        )
