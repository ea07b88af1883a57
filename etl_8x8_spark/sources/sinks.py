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
from pyspark.sql import functions as F


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
    values raise ``files_per_partition`` to re-split each value across
    that many tasks: a deterministic salt column joins the repartition
    key, so every partition value hashes into up to N distinct tasks
    (and therefore up to N output files) instead of collapsing the
    whole write to N total tasks.
    """
    if files_per_partition > 1:
        salt = F.pmod(
            F.hash(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)
        )
        out = (
            df.withColumn("_salt", salt)
            .repartition(*partition_by, "_salt")
            .drop("_salt")
        )
    else:
        out = df.repartition(*partition_by)
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)
