"""Graph operators over relational edge sets (SURVEY.md §2b
extensions). Companion to ``dedup_cluster_cc`` (connected components):
this module covers the *scoring* side of graph analytics — link
analysis over an edge table derived from the star schema.

Cross-engine determinism: PageRank contributions are 1/out_degree,
which is not exact in floats and float summation is order-dependent
(LESSONS #9). Contributions are therefore carried as integer
micro-units — ``floor(1e12 / out_degree)`` — summed exactly as
BIGINTs in any order, and converted to a double score once, at
finalization. Spark ``div`` and DuckDB ``//`` both floor positive
integer division, so the scores are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table

_SCALE = 1_000_000_000_000  # integer micro-units per unit of rank
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 kept rational


@register(
    "graph_pagerank_iter",
    oracle=f"""
WITH edges AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
),
outdeg AS (
  SELECT l_suppkey, COUNT(*) AS d FROM edges GROUP BY l_suppkey
),
contrib AS (
  SELECT e.l_partkey, {_SCALE} // o.d AS q
  FROM edges e JOIN outdeg o USING (l_suppkey)
),
ranked AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_in,
         SUM(q) AS qsum
  FROM contrib GROUP BY l_partkey
)
SELECT p.p_partkey,
       COALESCE(r.n_in, 0) AS n_in,
       round(0.15 + 0.85 * CAST(COALESCE(r.qsum, 0) AS DOUBLE) / {_SCALE},
             9) AS pr_score
FROM part p LEFT JOIN ranked r ON p.p_partkey = r.l_partkey
""",
)
def graph_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power iteration over the supplier→part bipartite
    graph induced by ``lineitem`` (uniform prior, damping 0.85):
    pr(part) = 0.15 + 0.85·Σ_suppliers 1/out_degree. Parts nobody
    supplies keep the teleport mass. The single-iteration shape is the
    building block — a full PageRank is this plan looped with
    ``localCheckpoint`` lineage truncation per round, exactly as
    ``dedup_cluster_cc`` already demonstrates for label propagation.

    Scale: exactly three hash exchanges — edge dedup on the pair, an
    unordered window count on the source key (out-degree WITHOUT a
    self-join, so the edge scan runs once, not twice), and the final
    rank groupBy with map-side partial sums of integer micro-units.
    No driver-side state — scores live in the DataFrame.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    edges = li.select("l_suppkey", "l_partkey").distinct()
    contrib = edges.withColumn(
        "d", F.count("*").over(Window.partitionBy("l_suppkey"))
    ).select("l_partkey", F.expr(f"{_SCALE} div d").alias("q"))
    ranked = contrib.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_in"),
        F.sum("q").alias("qsum"),
    )
    return part.join(
        ranked, part.p_partkey == ranked.l_partkey, "left"
    ).select(
        "p_partkey",
        F.coalesce("n_in", F.lit(0)).cast("long").alias("n_in"),
        F.round(
            0.15
            + 0.85 * F.coalesce("qsum", F.lit(0)).cast("double") / _SCALE,
            9,
        ).alias("pr_score"),
    )
