"""Sort / limit / set-operation operators (SURVEY.md §2b).

``sort_limit_topk`` is the global-top-K pattern: Spark compiles
``orderBy().limit(k)`` to TakeOrderedAndProject — each partition keeps
a k-row heap, the driver merges heaps; no global sort, no shuffle of
the full table. The set ops generalize R5's success∪error stream merge
(reference ``api_gateway.py:99-123``: one output stream built from two
disjoint record populations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table


@register(
    "sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price (deterministic via o_orderkey
    tiebreak — a LIMIT without a total order isn't a query, it's a
    dice roll)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "set_union_dedup",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
""",
)
def set_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + dedup of two keyed populations (R5's success/error
    stream merge shape). unionByName + dropDuplicates = SQL UNION."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return customer.unionByName(supplier).dropDuplicates()


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (distinct EXCEPT)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


_SAMPLE_PCT = {"click": 5, "view": 2, "purchase": 100, "signup": 100, "error": 50}

# The id is masked to 2^31 BEFORE the Knuth multiply so the product
# tops out at ~5.7e18 < Long.MAX — an unmasked id ≳ 3.5e9 would
# overflow 64-bit arithmetic (a throw under Spark ANSI mode and DuckDB
# alike), which matters for the 100 TB stable-dev-slice claim.
_SAMPLE_ORACLE = (
    "SELECT event_id, event_type, user_id FROM events WHERE "
    + " OR ".join(
        f"(event_type = '{t}' AND "
        f"((event_id % 2147483648) * 2654435761) % 4294967296 % 100 < {p})"
        for t, p in sorted(_SAMPLE_PCT.items())
    )
)


@register("sample_systematic", oracle=_SAMPLE_ORACLE)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-event-type rates (rare
    classes kept at 100%, bulk classes downsampled) decided by a
    Knuth-hash of the row id — NOT ``rand()``: the same row is always
    in or out, so samples are reproducible across runs, engines, and
    re-partitions, and joins between two samples of different tables
    stay consistent. This is how a 100 TB pipeline cuts a stable dev
    slice; ``df.sampleBy`` gives per-run Bernoulli draws instead.

    Pure map-side filter — no shuffle, pushes to the scan.
    """
    events = load_table(spark, sf_dir, "events")
    # mask to 2^31 first: see _SAMPLE_ORACLE's overflow note
    bucket = (
        ((F.col("event_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % 100
    rate = F.create_map(
        *[F.lit(x) for kv in _SAMPLE_PCT.items() for x in kv]
    )[F.col("event_type")]
    return events.filter(bucket < rate).select(
        "event_id", "event_type", "user_id"
    )
