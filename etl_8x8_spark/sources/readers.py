"""Source connectors.

Parquet is the primary columnar source: Catalyst pushes predicates and
projections into the scan (row-group skipping + column pruning), so
query builders just ``load_table(...).select(...).filter(...)`` and let
the optimizer move the work into the reader.

CSV / JSON-lines readers always take an explicit schema (never
``inferSchema`` — a full extra pass over 100 TB) mirroring the
reference's boundary validation (R14, SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_8x8_spark.sources.schemas import TABLE_SCHEMAS


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def pin_session_confs(spark: SparkSession) -> None:
    """Pin the session confs every engine query depends on.

    This is the ONE sanctioned place the engine mutates the (possibly
    driver-supplied) session, and the mutation is deliberately
    persistent rather than save/restored: Spark evaluates these confs
    lazily (``nanosAsLong`` at parquet schema conversion, the timezone
    at expression execution), so restoring them before the caller runs
    its action would silently change semantics mid-plan.

    - ``spark.sql.session.timeZone=UTC``: the testdata timestamps are
      UTC wall-clock and DuckDB compares naive-UTC; every
      timestamp-rendering/parsing expression must agree.
    - ``spark.sql.legacy.parquet.nanosAsLong=true``: ``events.ts`` is
      physically TIMESTAMP(NANOS), which Spark's reader otherwise
      rejects; it is read as nanos-since-epoch and floor-converted to
      micros (the same truncation DuckDB 1.x applies on read).
    - ``spark.sql.parser.escapedStringLiterals=false`` (r16 ADVICE):
      the SQL-string expression twins (dedup._NORM_SQLX regexes, the
      BPE merge literals in text.py) encode ``'\\\\s+'``-style escapes
      that unescape correctly only under the default parser; a
      driver-supplied session with the legacy conf set would silently
      flip them to literal-backslash matches and diverge from the
      Column forms and the oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one engine table.

    No explicit schema is passed for parquet: the footer is
    authoritative and self-describing; forcing TABLE_SCHEMAS here would
    disable vectorized-reader schema evolution. TABLE_SCHEMAS is used
    for the schemaless formats (csv/json) and for validation in tests.
    """
    pin_session_confs(spark)
    if name == "events":
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) parquet surfaces as nanos-since-epoch
            # under the legacy conf; floor-divide to micros via pmod
            # (integer `div` would truncate toward zero and round
            # pre-1970 timestamps UP by 1 µs, diverging from DuckDB's
            # TIMESTAMP_NS downcast; a double floor() would lose
            # precision above 2^53). Micros-native files pass through.
            micros = F.expr("(ts - pmod(ts, 1000)) div 1000")
            df = df.withColumn("ts", F.timestamp_micros(micros))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Micros-native parquet with no isAdjustedToUTC flag reads
            # as TIMESTAMP_NTZ, which time arithmetic (unix_micros,
            # window(), watermarks) rejects. Under the pinned UTC
            # session zone the LTZ cast is value-identical to DuckDB's
            # naive reading, so oracles keep hash-matching.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(table_path(sf_dir, name))


def widen_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the session's cores when the input
    has fewer partitions than the cluster has slots (guide §2.5
    "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    The sf fixtures are one parquet row group each, so a scan is ONE
    task; an operator whose per-row compute dominates (tokenize +
    shingle folds) then runs single-threaded however many cores the
    session has. The repartition is CONDITIONAL: at real scale the
    input already carries >= slots partitions and this is a no-op —
    no extra exchange is ever added to a properly-split input. Only
    callers whose downstream is key-based (distinct/groupBy/window
    per key) may use it: a round-robin repartition changes row order.
    """
    sc = df.sparkSession.sparkContext
    slots = sc.defaultParallelism
    if df.rdd.getNumPartitions() < slots:
        return df.repartition(slots)
    return df


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-on-read JSON-lines ingest (generalizes R3
    ``requires_json_payload``, reference ``api_gateway.py:126-137``).

    PERMISSIVE mode with a corrupt-record column = the reference's
    malformed-JSON -> 415 routing: bad rows land in ``_corrupt_record``
    instead of failing the job.
    """
    # StructType.add MUTATES self (and returns it): calling this twice
    # on a shared schema object would append a duplicate column and
    # fail the second read in the same session. Build a fresh copy.
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Delimited ingest with an explicit schema (inference off)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def scratch_dir() -> str:
    """Writable scratch area for sink round-trips and derived files."""
    d = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
    os.makedirs(d, exist_ok=True)
    return d
