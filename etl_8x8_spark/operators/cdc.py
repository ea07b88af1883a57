"""Change-data-capture operators: snapshot diffing (SURVEY.md §2b
extensions — the incremental-pipeline counterpart of join_dim_scd2 /
window_scd2_build, which *apply* changes; this family *detects* them).

The "old" snapshot is the ``orders`` table; the "new" snapshot is
derived from it deterministically (deletes/updates/inserts keyed on
``o_orderkey`` residues) so the diff has a planted, oracle-checkable
answer at every scale factor — the same seeding pattern the dedup
family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table

# residue classes that change between snapshots
_DEL = 97  # keys deleted from the new snapshot
_UPD = 13  # keys whose priority is rewritten
_INS = 101  # keys cloned (offset) as brand-new rows
_INS_OFF = 10_000_000

_NEW_SNAPSHOT_SQL = f"""
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {_UPD} = 0 THEN 'X-CHANGED'
              ELSE o_orderpriority END AS o_orderpriority,
         o_totalprice
  FROM orders WHERE o_orderkey % {_DEL} <> 0
  UNION ALL
  SELECT o_orderkey + {_INS_OFF} AS o_orderkey,
         '9-NEW' AS o_orderpriority,
         o_totalprice
  FROM orders WHERE o_orderkey % {_INS} = 0
"""


def _new_snapshot(old: DataFrame) -> DataFrame:
    """Spark twin of _NEW_SNAPSHOT_SQL."""
    changed = old.filter(F.col("o_orderkey") % _DEL != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % _UPD == 0, F.lit("X-CHANGED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_totalprice",
    )
    inserted = old.filter(F.col("o_orderkey") % _INS == 0).select(
        (F.col("o_orderkey") + _INS_OFF).alias("o_orderkey"),
        F.lit("9-NEW").alias("o_orderpriority"),
        "o_totalprice",
    )
    return changed.unionByName(inserted)


@register(
    "cdc_snapshot_diff",
    oracle=f"""
WITH old_snap AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
),
new_snap AS ({_NEW_SNAPSHOT_SQL})
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.o_orderkey IS NULL THEN 'insert'
            ELSE 'update' END AS change_type,
       o.o_orderpriority AS old_priority,
       n.o_orderpriority AS new_priority
FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
WHERE n.o_orderkey IS NULL OR o.o_orderkey IS NULL
   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two table snapshots into a row-level change feed:
    full-outer join on the business key, classify each key as
    insert / delete / update (any compared column differs,
    null-safely), emit only the delta. This is the
    snapshot-to-changelog operator every incremental 100 TB pipeline
    needs when the upstream can't emit a changelog itself.

    Scale: one sort-merge join on the key — the canonical layout for
    repeated diffing is both snapshots bucketed/clustered by key
    (see ``join_bucketed_colocated``: the exchange disappears
    entirely). Column comparison is map-side after the join
    (``eqNullSafe``); output is only changed rows, so the sink is
    proportional to churn, not table size.
    """
    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    new = _new_snapshot(load_table(spark, sf_dir, "orders"))
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("n.o_orderkey").isNull(), F.lit("delete"))
        .when(F.col("o.o_orderkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    same = F.col("o.o_orderpriority").eqNullSafe(
        F.col("n.o_orderpriority")
    ) & F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
    return (
        joined.filter(
            F.col("n.o_orderkey").isNull()
            | F.col("o.o_orderkey").isNull()
            | ~same
        )
        .select(
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias(
                "o_orderkey"
            ),
            change.alias("change_type"),
            F.col("o.o_orderpriority").alias("old_priority"),
            F.col("n.o_orderpriority").alias("new_priority"),
        )
    )
