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


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Partition-level upsert: replace ONLY the partitions present in
    ``df``, leaving all others untouched (dynamic partition overwrite).

    This is the idempotent-reprocessing primitive a 100 TB pipeline
    runs daily: recompute one day/status partition and swap it in
    without touching (or even listing) the other thousands of
    partitions. The conf is scoped to the write via the DataFrameWriter
    option-free session conf save/restore — partitionOverwriteMode is
    read at execution of THIS write, which happens eagerly here.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(*partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark,
    path: str,
    target_rows_per_file: int,
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet directory so each
    output file holds ~``target_rows_per_file`` rows.

    The 100 TB reality this serves: streaming/partitioned writers leave
    thousands of KB-sized files per partition; scan cost becomes file-
    listing + open overhead instead of IO. Compaction = read + count +
    repartition to ceil(rows/target) + swap. The swap renames the
    original ASIDE before renaming the compacted dir into place, so a
    crash at any point leaves the dataset recoverable in either
    ``path``, ``path.compacting`` or ``path.old`` — it is never only
    deleted. Returns (files_before, files_after).
    """
    import glob
    import os
    import shutil

    files_before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    base = path.rstrip("/")
    tmp, old = base + ".compacting", base + ".old"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return files_before, files_after
