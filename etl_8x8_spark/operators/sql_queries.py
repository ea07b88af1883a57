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
    "part",
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


# TPC-H Q1 shape (pricing summary report): the canonical full-fact-scan
# aggregation — one pass over lineitem, 4-way grouped sums/averages.
# Every average is an exact decimal SUM divided by COUNT in double so
# both engines derive the identical IEEE value from the identical exact
# numerator (never a running double mean, which is order-dependent).
_Q1_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
           AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
           / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
           AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_tpch_q1_shape", oracle=_Q1_SQL)
def sql_tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single full scan of the fact, grouped to a
    handful of rows. The scale-defining property is the map-side
    partial aggregate — 4 groups means the shuffle carries ~4 rows per
    task regardless of fact size, so the plan is scan-bound at 100 TB.
    The date filter and 5-column projection push to the parquet scan."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q1_SQL)


# TPC-H Q6 shape (forecasting revenue change): pure filter-and-sum,
# zero joins, one output row. The whole query rides parquet min/max
# pruning + whole-stage codegen; its value as a benchmark is that ANY
# shuffle beyond the single-row final agg is a plan bug.
_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("sql_tpch_q6_shape", oracle=_Q6_SQL)
def sql_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive range filters feeding a global sum.
    All three predicates push to the scan (PushedFilters), the
    projection narrows to 3 columns, and the aggregation is a
    single-row partial+final — the minimal-shuffle template every
    selective-scan query should compile to."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


# TPC-H Q4 shape (order priority checking). The testdata lacks
# l_commitdate/l_receiptdate, so "late line" is re-expressed as a line
# shipped more than 90 days after the order date — same EXISTS
# (correlated, inequality inside) → left-semi-join rewrite the
# original exercises.
_Q4_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_tpch_q4_shape", oracle=_Q4_SQL)
def sql_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery against the fact,
    rewritten by Catalyst to a left semi join — lineitem contributes
    at most one match per order, so the join output never exceeds the
    (quarter-filtered) orders side, and the semi join degenerates to a
    key-dedup'd shuffle rather than a fan-out."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


# TPC-H Q14 shape (promotion effect): conditional share-of-total over a
# fact↔dim join in one month. Both the numerator and denominator are
# exact decimal sums; only the final ratio is computed in double, so
# the value hashes identically across engines.
_Q14_SQL = """
SELECT /*+ BROADCAST(part) */
       100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,6))
                   ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(30,6))) AS DOUBLE)
           AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


@register("sql_tpch_q14_shape", oracle=_Q14_SQL)
def sql_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one-month fact slice joined to the part dim,
    conditional aggregation into a promo-share ratio. part broadcasts
    (it is a dim at every SF), the month filter pushes to the lineitem
    scan, and the CASE folds into the map-side partial — a single
    shuffle of two partial sums."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)
