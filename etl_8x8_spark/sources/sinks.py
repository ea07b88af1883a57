"""Sink connectors.

The reference's only sinks are the HTTP response record and CloudWatch
logs (SURVEY.md §2a); the engine's primary sink is partitioned parquet —
at 100 TB, partitioning by a low-cardinality business key (date, status)
gives partition pruning to every downstream reader, and a pre-write
``repartition`` on the partition columns avoids the
small-files explosion (one file per task per partition value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Partitioned columnar write.

    ``repartition(*partition_by)`` co-locates each partition value's
    rows into one task so a 1000-executor write produces
    O(values) files, not O(values × tasks). For very hot partition
    values raise ``files_per_partition`` to re-split them.
    """
    out = df.repartition(*partition_by)
    if files_per_partition > 1:
        out = df.repartition(files_per_partition, *partition_by)
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)
