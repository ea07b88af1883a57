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

import weakref

from pyspark.sql import DataFrame, SparkSession

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table, pin_session_confs

_VIEW_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]

#: Sessions whose temp views are already registered, mapped to the
#: sf_dir they were registered for. Weak keys: a stopped/collected
#: session drops out, and a NEW session object always re-registers.
_VIEWS_READY: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_table_views(
    spark: SparkSession, sf_dir: str, tables: list[str]
) -> None:
    """Register a subset of the shared TPC-H view names for a builder
    outside this module (join_existence_mark, join_lateral_topk,
    agg_grouping_sets). ALL writers of the shared names route through
    here so the _register_views memo can never serve stale content
    (r16 ADVICE item 1): a foreign registration with a DIFFERENT
    sf_dir overwrites some of the seven views, so it must drop the
    memo — the next sql_* builder re-registers all seven for its own
    sf_dir. A same-sf_dir foreign registration re-creates the
    identical ``load_table`` plan and the memo stays valid.
    """
    pin_session_confs(spark)
    if _VIEWS_READY.get(spark) != sf_dir:
        _VIEWS_READY.pop(spark, None)
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the seven TPC-H views once per (session, sf_dir).

    r15 (guide §4.4 measurement): every ``spark.sql`` builder paid
    ~0.45 s re-running seven ``spark.read.parquet`` +
    ``createOrReplaceTempView`` py4j round-trip chains per BUILD —
    ~10 s across the 22 TPC-H shapes alone — for catalog metadata
    that is identical within one session. The memo is session-scoped
    METADATA (never query results): each bench chunk's fresh session
    re-registers, an sf_dir switch re-registers, and every other
    writer of these view names routes through
    :func:`register_table_views`, which drops the memo on a foreign
    sf_dir (r16) — a hit can never serve different content. Session
    confs are still re-pinned on every call — they are the one
    mutation a foreign builder could legally have changed.
    """
    pin_session_confs(spark)
    if _VIEWS_READY.get(spark) == sf_dir:
        return
    for t in _VIEW_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    _VIEWS_READY[spark] = sf_dir


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
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
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


# TPC-H Q2 shape (minimum-cost supplier). The testdata has no partsupp
# table, so the supplier catalog is derived from observed trade: the
# per-(part, supplier) minimum extended price over lineitem plays
# ps_supplycost. The structural challenge is intact — a correlated
# scalar MIN subquery over the same multi-join DAG as the outer query,
# which Catalyst decorrelates into an aggregate + join on p_partkey.
_Q2_SQL = """
WITH offer AS (
  SELECT l_partkey AS partkey,
         l_suppkey AS suppkey,
         MIN(l_extendedprice) AS offer_price
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT /*+ BROADCAST(part, nation, region) */
       s_acctbal, s_name, n_name, p_partkey, p_name, offer_price
FROM part
JOIN offer    ON p_partkey = offer.partkey
JOIN supplier ON s_suppkey = offer.suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15
  AND p_type = 'STANDARD'
  AND r_name = 'EUROPE'
  AND offer_price = (
    SELECT MIN(o2.offer_price)
    FROM offer o2
    JOIN supplier s2 ON s2.s_suppkey = o2.suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE o2.partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("sql_tpch_q2_shape", oracle=_Q2_SQL)
def sql_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MIN subquery over a 5-way
    join, decorrelated by Catalyst into a per-part minimum aggregate
    joined back on (p_partkey, offer_price). The offer CTE (the
    partsupp proxy) is part*supplier-keyed — far smaller than the fact
    but bigger than a dim, so it shuffle-joins while the true dims
    broadcast. Shape parity: reference-class engines run this as
    TPC-H Q2; testdata lacks partsupp, columns adapted accordingly."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# TPC-H Q8 shape (national market share): one nation's share of
# revenue inside one customer-region market for one part type, by
# order year. The share is a conditional-sum / total-sum ratio where
# both legs are exact decimal sums, so the final double division is
# bit-identical across engines.
_Q8_SQL = """
SELECT /*+ BROADCAST(part, customer, supplier, n1, n2, region),
           SHUFFLE_MERGE(lineitem) */
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(30,6))
                ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


@register("sql_tpch_q8_shape", oracle=_Q8_SQL)
def sql_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the widest classic join DAG (8 relations, with
    nation in two roles), reduced to a per-year share-of-total. All
    six dims broadcast; lineitem and orders are the only shuffled
    relations, and the conditional numerator folds into the same
    map-side partial aggregate as the denominator."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


# TPC-H Q9 shape (product-type profit): profit per supplier nation per
# year over a part-name slice. ps_supplycost does not exist in the
# testdata; the cost leg is re-expressed as 10% of retail price times
# quantity (p_retailprice is the part-level price column available).
# Both profit legs are computed in exact decimal before summation.
_Q9_SQL = """
SELECT /*+ BROADCAST(part, supplier, nation),
           SHUFFLE_MERGE(lineitem) */
       n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
              - CAST(0.1 * p_retailprice * l_quantity AS DECIMAL(30,6)))
            AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("sql_tpch_q9_shape", oracle=_Q9_SQL)
def sql_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: an unselective LIKE part filter (no pushdown
    win — the predicate is a substring match evaluated post-scan)
    over the full fact history, grouped by nation and year. The
    scale property: every dim broadcasts, so the only shuffle is the
    25-nation x 7-year partial-aggregate exchange."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


# TPC-H Q11 shape (important stock): per-part revenue share against a
# global scalar subquery, supplier-nation filtered. The same source
# slice is aggregated twice (per-part and global); the HAVING
# threshold compares doubles derived from exact decimal sums. The
# original's FRACTION-of-total gate is scale-DEPENDENT by spec
# (0.0001/SF — at 10x the parts no part holds 0.1% of total and the
# result is vacuously empty, LESSONS.md #20); the gate here is 2x the
# mean per-part value, which selects a stable "important" head at
# every SF while keeping the same uncorrelated-scalar shape.
_Q11_SQL = """
SELECT /*+ BROADCAST(supplier, nation), SHUFFLE_MERGE(lineitem) */
       l_partkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) > (
  SELECT 2.0 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(DISTINCT l_partkey)
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
ORDER BY part_value DESC, l_partkey
"""


@register("sql_tpch_q11_shape", oracle=_Q11_SQL)
def sql_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-by HAVING gated on an uncorrelated
    scalar subquery over the same filtered slice — the
    fraction-of-total report. Spark evaluates the scalar subquery
    once (a 1-row broadcast into the HAVING filter), never per-group;
    both aggregations share the broadcast dim prune of nation."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# TPC-H Q12 shape (shipping priority audit): the testdata has no
# l_shipmode / commit / receipt dates, so "late" is shipped >60 days
# after order date and the low-cardinality bucket is l_returnflag.
# The CASE counts split each bucket into urgent vs other order
# priorities — same conditional dual-count shape as the original.
_Q12_SQL = """
SELECT /*+ SHUFFLE_MERGE(lineitem) */
       l_returnflag AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY ship_bucket
"""


@register("sql_tpch_q12_shape", oracle=_Q12_SQL)
def sql_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-to-fact equi-join (orders x lineitem)
    with a cross-table inequality residual (ship > order + 60d) that
    cannot push below the join, then conditional dual counts into 3
    buckets. The year filter DOES push to the lineitem scan; the
    join is the only wide shuffle."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


# TPC-H Q13 shape (customer order distribution): LEFT OUTER with a
# filter in the ON clause (so customers with zero qualifying orders
# survive with count 0), then a histogram of the per-customer counts —
# the canonical two-level aggregation.
_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("sql_tpch_q13_shape", oracle=_Q13_SQL)
def sql_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the ON-clause filter is the semantic crux —
    pushing o_orderpriority <> '1-URGENT' below the LEFT JOIN as a
    WHERE would delete zero-order customers; in the ON clause it only
    suppresses matches. First aggregation is customer-keyed (wide),
    second collapses to ~tens of count-of-count rows."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


# TPC-H Q15 shape (top supplier): a revenue CTE reused twice — once
# joined to supplier, once reduced to its MAX as an uncorrelated
# scalar subquery. Revenue is an exact decimal sum cast to double, so
# the MAX-equality match is bit-identical across engines.
_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("sql_tpch_q15_shape", oracle=_Q15_SQL)
def sql_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE referenced twice (argmax-over-aggregate).
    Spark plans the revenue aggregate twice (one feeding the scalar
    MAX, one joining to supplier) — both are quarter-filtered scans
    reduced to supplier-count rows before any join, so the duplicate
    evaluation is a few-KB aggregate, not a second fact shuffle."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# TPC-H Q16 shape (supplier diversity per part class): count distinct
# suppliers per (brand, type, size) over observed trade, excluding a
# NOT IN supplier denylist (negative account balance standing in for
# the original's complaint-comment scan).
_Q16_SQL = """
SELECT /*+ BROADCAST(part) */
       p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("sql_tpch_q16_shape", oracle=_Q16_SQL)
def sql_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (null-free key) compiles to an anti
    join against a tiny broadcast denylist; the distinct-count per
    3-part group key is the expensive leg (two-phase: dedup shuffle
    on (group, suppkey), then count). Part filters prune before the
    fact join via the broadcast hash."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


# TPC-H Q17 shape (small-quantity revenue): per-part correlated
# average threshold. l_quantity is integral, so AVG's double sum is
# exact (< 2^53) and the 0.2x threshold is bit-identical across
# engines; the output sum stays in exact decimal.
_Q17_SQL = """
SELECT /*+ BROADCAST(part) */
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@register("sql_tpch_q17_shape", oracle=_Q17_SQL)
def sql_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG per part, decorrelated
    by Catalyst into a per-partkey aggregate joined back to the fact.
    The decorrelated aggregate is part-keyed (dim-sized) and
    broadcast-joins; the brand filter prunes the probe side through
    the part broadcast before the threshold compare."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# TPC-H Q19 shape (disjunctive discount revenue): three conjunctive
# brand/size/quantity clauses OR'd together across the part join —
# the classic test that the optimizer extracts the common join key
# and keeps the disjunction as a residual filter instead of a
# cartesian fallback.
_Q19_SQL = """
SELECT /*+ BROADCAST(part) */
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@register("sql_tpch_q19_shape", oracle=_Q19_SQL)
def sql_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: the disjunction references both sides of the
    join, so no single clause can push to either scan — but the join
    itself stays a plain p_partkey broadcast hash join with the OR as
    a post-join residual. A naive planner turns this into a
    cartesian; the plan test pins BroadcastHashJoin."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


# TPC-H Q20 shape (part promotion candidates): nested IN chain —
# suppliers who moved significant volume of a part-name slice in one
# year. The inner IN (part) nests inside the volume HAVING subquery,
# exactly the original's partsupp->part chain re-rooted on lineitem.
_Q20_SQL = """
SELECT /*+ BROADCAST(nation) */ s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_4'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
    )
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100
  )
ORDER BY s_suppkey
"""


@register("sql_tpch_q20_shape", oracle=_Q20_SQL)
def sql_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two nested INs — the innermost (part-name
    slice) semi-joins the fact, the volume aggregate gates suppliers,
    and the outer IN semi-joins the supplier dim. Each IN compiles to
    a left semi join; the aggregate reduces the fact to supplier-key
    cardinality before it ever touches the supplier table."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS /
# NOT EXISTS pair over the same fact. "Late" is shipped >90 days
# after order date (no receipt/commit dates in the testdata); the
# NOT EXISTS leg re-derives each sibling line's lateness via its own
# orders join so the correlation stays a pure l_orderkey equality.
_Q21_SQL = """
SELECT /*+ BROADCAST(supplier, nation) */ s_name,
       COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
JOIN nation      ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_5'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1
    FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("sql_tpch_q21_shape", oracle=_Q21_SQL)
def sql_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest classic subquery pattern — a
    correlated EXISTS (another supplier touched the order) AND a
    correlated NOT EXISTS (no OTHER supplier was late), both over the
    fact itself. Catalyst compiles them to a left semi + left anti
    join on l_orderkey with the supplier-inequality as a join
    residual; three passes over lineitem, each shuffled once on
    orderkey."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# TPC-H Q22 shape (global sales opportunity): customers with
# above-average balance and no orders, bucketed by "country code" —
# the last two digits of c_name (the testdata has no phone column) —
# and "no orders" scoped to urgent orders (every customer has SOME
# order at every SF, so the unscoped anti join is vacuously empty).
# The average threshold is computed as exact-decimal SUM / COUNT so
# the scalar compares bit-identically across engines.
_Q22_SQL = """
SELECT cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
FROM (
  SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE right(c_name, 2) IN ('10', '11', '12', '13', '14', '15', '16')
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*)
      FROM customer c2
      WHERE c2.c_acctbal > 0.0
        AND right(c2.c_name, 2) IN ('10', '11', '12', '13', '14',
                                    '15', '16')
    )
) cust
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("sql_tpch_q22_shape", oracle=_Q22_SQL)
def sql_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar-average threshold + a
    NOT EXISTS anti join against the orders fact, grouped by derived
    code. The anti join shuffles customer (small) against the
    distinct o_custkey side; the scalar average is a one-row
    broadcast. No dim join at all — the code is derived in-row."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# Recursive-CTE hierarchy expansion (Spark 4.x WITH RECURSIVE —
# SPARK-24497). The testdata has no explicit hierarchy, so a forest is
# derived arithmetically from customer keys: node c's parent is
# floor(c/10), with keys <= 10 as roots — a stable ~10-ary forest whose
# depth grows log10(SF), so recursion depth stays < 10 even at sf100.
# The anchor/step text is IDENTICAL in both engines: FLOOR(x / 10.0)
# instead of integer `/` because DuckDB's int `/` yields DOUBLE while
# Spark's yields the integral type, whereas IEEE double division is
# correctly rounded — bit-identical — in both (keys < 2^49 keep the
# quotient > 0.1 away from integers, so the floor can never straddle).
_RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE nodes AS (
  SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
  FROM customer
  WHERE c_custkey <= 10
  UNION ALL
  SELECT c.c_custkey AS node, n.root, n.depth + 1 AS depth
  FROM customer c
  JOIN nodes n ON CAST(FLOOR(c.c_custkey / 10.0) AS BIGINT) = n.node
  WHERE c.c_custkey > 10
)
SELECT CAST(depth AS INT) AS depth,
       COUNT(*) AS n_nodes,
       COUNT(DISTINCT root) AS n_roots,
       MIN(node) AS min_node,
       MAX(node) AS max_node,
       CAST(SUM(node) AS BIGINT) AS sum_node
FROM nodes
GROUP BY depth
ORDER BY depth
"""


@register("sql_recursive_hierarchy", oracle=_RECURSIVE_HIERARCHY_SQL)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy walk (org charts, BOM explosion,
    category trees): WITH RECURSIVE seeds the roots and joins one
    level per iteration, carrying (root, depth) down a ~10-ary forest
    derived from customer keys; the outer query profiles the forest
    per level. This exercises Spark 4's recursive CTE surface
    (UnionLoop) end-to-end — the one SQL shape the engine could not
    express declaratively before 4.0.

    Scale: each iteration is ONE hash join of the (small) frontier
    against the child table, and the frontier shrinks/plateaus as the
    forest widens — iterations = tree depth = log10(keys), so sf100
    costs ~8 chained joins, not row-count-proportional work. The
    level-profile aggregate at the end is a 6-group hash agg. All
    integer arithmetic — no float drift anywhere.
    """
    _register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_HIERARCHY_SQL)
