"""Full analytic queries through the SQL interface (``spark.sql`` over
registered temp views) — the engine's "whole query" layer on top of the
per-operator surface, in TPC-H shapes adapted to the testdata columns.

These exercise what single-operator keys can't: multi-table join
ordering, filter pushdown through joins, and aggregate-then-top-k
pipelines, all through the same Catalyst path a SQL user hits. The
DuckDB oracles are near-verbatim the same SQL (decimal-cast sums for
cross-engine hash parity, per functions/parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table

_VIEW_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "orders",
    "lineitem",
]


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in _VIEW_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# TPC-H Q3 shape (shipping priority): the testdata lacks o_shippriority,
# so the query groups on (l_orderkey, o_orderdate, o_orderpriority).
# The hint pins the scale-correct physical plan: broadcast the DIM
# (customer), never the filtered FACT (lineitem) — file-size stats
# after a selective filter can dip under the broadcast threshold at
# test SF, and broadcasting a fact table is exactly the plan that
# dies at 100 TB. DuckDB parses /*+ ... */ as a plain comment, so the
# same SQL text stays the oracle.
_Q3_SQL = """
SELECT /*+ BROADCAST(customer), SHUFFLE_MERGE(lineitem) */ l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate_str,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("sql_tpch_q3_shape", oracle=_Q3_SQL)
def sql_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through ``spark.sql``: 3-table join, filters on
    all three tables (each pushed to its own scan), aggregate, top-10.

    Identical SQL text runs on both engines; the decimal-cast revenue
    makes the ORDER BY deterministic cross-engine (exact sums), with
    l_orderkey as the tiebreak. Catalyst reorders the joins from
    statistics exactly as it would at cluster scale.
    """
    _register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


# TPC-H Q5 shape (local supplier volume): all six tables exist with the
# needed keys; the region filter + date range mirror the original.
_Q5_SQL = """
SELECT /*+ BROADCAST(customer, supplier, nation, region),
           SHUFFLE_MERGE(lineitem) */ n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("sql_tpch_q5_shape", oracle=_Q5_SQL)
def sql_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape through ``spark.sql``: 6-table join (two fact
    tables + four dims), the classic broadcast-the-dims /
    shuffle-the-facts plan. The c_nationkey = s_nationkey condition
    makes it a genuine multi-way constraint, not a star lookup."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


# TPC-H Q7 shape (volume shipping): revenue flow between two specific
# nations, by year and direction. Exercises a join DAG where the same
# dim (nation) joins twice under different roles.
_Q7_SQL = """
SELECT /*+ BROADCAST(customer, supplier, n1, n2),
           SHUFFLE_MERGE(lineitem) */
       n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


@register("sql_tpch_q7_shape", oracle=_Q7_SQL)
def sql_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the two-role dimension pattern — nation joins
    TWICE (supplier's nation, customer's nation) with a disjunctive
    cross-filter between the roles, grouped by direction and year.
    Both nation sides broadcast; the OR predicate evaluates after the
    joins (it references both roles, so it can't push below either)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


# TPC-H Q10 shape (returned-item reporting): revenue lost to returns
# per customer in one quarter, top 20 customers.
_Q10_SQL = """
SELECT /*+ BROADCAST(nation), SHUFFLE_MERGE(lineitem) */
       c_custkey,
       c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       n_name,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("sql_tpch_q10_shape", oracle=_Q10_SQL)
def sql_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filters (one quarter of orders,
    returned lines only) joined up to the customer, aggregated, then
    top-20 — filter pushdown on BOTH fact tables feeding a
    TakeOrderedAndProject, the report-query shape."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


# TPC-H Q18 shape (large-volume customers): aggregate-subquery HAVING
# gate, then a 3-table join re-aggregated per order. The HAVING
# subquery and the outer query both scan lineitem — Catalyst keeps
# them as two scans with the subquery side reduced to a semi-joinable
# key set BEFORE the wide join (quantity sums shrink to qualifying
# orderkeys: ~1% of orders), so the expensive join fans out over the
# filtered fact only. Decimal sums for hash parity.
_Q18_SQL = """
SELECT /*+ BROADCAST(customer) */ c_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate_str,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 250
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("sql_tpch_q18_shape", oracle=_Q18_SQL)
def sql_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) adapted to the testdata:
    orders whose total line quantity exceeds a threshold, re-joined to
    customers and re-aggregated, top-100 by price. Exercises the
    aggregate-IN-subquery → semi join rewrite plus a two-level
    aggregation over the same fact table — the shape where a naive
    plan scans-and-shuffles lineitem's full width twice.
    """
    _register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)
