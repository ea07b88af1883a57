"""Feature-engineering operators (round 5): the column-preparation
primitives a training pipeline runs between the warehouse and the
trainer — per-group normalization and time-decayed engagement
scoring. Both are single-pass, integer/decimal-exact where the
cross-engine gate needs determinism, and windowed/grouped on the keys
they would shuffle on at 100 TB.

Reference parity: the reference (serverless template,
``src/handlers.py:20-88``) has no feature math; these generalize the
BASELINE.json training-data north star the same way the dedup /
similarity families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# per-group feature scaling: z-score + min-max + percent_rank
# ---------------------------------------------------------------------------

_SCALE_ORACLE = """
WITH stats AS (
  SELECT c_mktsegment AS segment,
         COUNT(*) AS n,
         CAST(SUM(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e2 AS s1,
         CAST(SUM(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT)
                  * CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e4 AS s2,
         MIN(c_acctbal) AS lo,
         MAX(c_acctbal) AS hi
  FROM customer GROUP BY 1
),
scaled AS (
  SELECT c.c_custkey AS custkey, s.segment,
         c.c_acctbal AS acctbal,
         (c.c_acctbal - s.s1 / s.n)
           / sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 1e-12))
           AS z,
         CASE WHEN s.hi > s.lo
              THEN (c.c_acctbal - s.lo) / (s.hi - s.lo) ELSE 0.5 END AS mm,
         percent_rank() OVER (PARTITION BY c.c_mktsegment
                              ORDER BY c.c_acctbal, c.c_custkey) AS pr
  FROM customer c JOIN stats s ON s.segment = c.c_mktsegment
)
SELECT custkey, segment, acctbal,
       CAST(floor(z * 1e6 + 0.5) AS BIGINT) / 1e6 AS z_score,
       CAST(floor(mm * 1e6 + 0.5) AS BIGINT) / 1e6 AS minmax,
       CAST(floor(pr * 1e6 + 0.5) AS BIGINT) / 1e6 AS pct_rank
FROM scaled
ORDER BY custkey
"""


@register("ml_feature_scaling", oracle=_SCALE_ORACLE)
def ml_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment feature normalization: z-score, min-max, and
    percent-rank of account balance, each within the customer's
    market segment — the three standard scalings a feature pipeline
    applies before training, computed for every row in ONE pass.

    Plan: segment moments come from a |segments|-row aggregate of
    exact DECIMAL component sums (broadcast back), so mean/variance
    are identical doubles in both engines; percent_rank is one window
    on the same segment key the join shuffles on (exchange reuse).
    All three outputs floor-quantized to 6 dp (tie-stable). At 100 TB
    this is a scan + one broadcast join + one window — no per-feature
    rescans.
    """
    cust = load_table(spark, sf_dir, "customer")
    # moments from exact 1e2-unit integers (BIGINT-safe: |cents| <= 1e6,
    # squares <= 1e12) — DECIMAL x DECIMAL would hit precision-overflow
    # scale clamping that Spark and DuckDB resolve differently
    cents = F.floor(F.col("c_acctbal") * 1e2 + 0.5).cast("long")
    stats = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n"),
        (F.sum(cents).cast("double") / 1e2).alias("s1"),
        (F.sum(cents * cents).cast("double") / 1e4).alias("s2"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
    joined = cust.join(
        F.broadcast(stats), cust.c_mktsegment == stats.segment
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(1e-12))
    z = (F.col("c_acctbal") - mean) / F.sqrt(var)
    mm = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo")),
    ).otherwise(0.5)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    pr = F.percent_rank().over(w)
    q6 = lambda c: F.floor(c * 1e6 + 0.5).cast("long") / F.lit(1e6)  # noqa: E731
    return (
        joined.select(
            F.col("c_custkey").alias("custkey"),
            "segment",
            F.col("c_acctbal").alias("acctbal"),
            q6(z).alias("z_score"),
            q6(mm).alias("minmax"),
            q6(pr).alias("pct_rank"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# time-decayed engagement score (exact power-of-two half-life decay)
# ---------------------------------------------------------------------------

# Half-life 7 days, bucketed: weight = 2^-(age_days // 7), capped at 30
# halvings. Powers of two make the decay EXACT integer arithmetic —
# engine-portable with no pow() ulp drift — computed as
# value_cents · 2^(CAP - k) summed in DECIMAL, then scaled once.
_DECAY_CAP = 30
_US_PER_DAY = 86_400_000_000

_DECAY_ORACLE = f"""
WITH ref AS (
  SELECT MAX(epoch_us(ts)) AS ref_us FROM events
),
w AS (
  SELECT e.user_id,
         CAST(floor(e.value * 1e2 + 0.5) AS BIGINT) AS cents,
         LEAST(CAST({_DECAY_CAP} AS BIGINT),
               ((r.ref_us - epoch_us(e.ts)) // {_US_PER_DAY}) // 7) AS k
  FROM events e CROSS JOIN ref r
  WHERE e.event_type IN ('purchase', 'click')
),
agg AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))
                  * CAST(CAST(1 AS BIGINT) << CAST({_DECAY_CAP} - k AS INT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS wsum
  FROM w GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(floor(wsum / {(1 << _DECAY_CAP) * 100.0} * 1e6 + 0.5) AS BIGINT)
         / 1e6 AS decay_score
FROM agg
ORDER BY user_id
"""


@register("agg_decay_sum", oracle=_DECAY_ORACLE)
def agg_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score per user: recent purchase/click
    value counts fully, older activity halves every 7 days — the
    recency-weighted feature behind churn models and ranking signals.

    Exactness: the decay is bucketed to power-of-two weights
    (2^-(age_days//7)), so the weighted sum is integer cents times an
    integer power — accumulated in DECIMAL(38,0) with NO float pow()
    (whose last-ulp differs across engines) — and converted to a
    double exactly once. The reference timestamp is a 1-row broadcast
    max. One scan, one groupBy on user_id: scan-shaped at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    ref = events.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    w = (
        events.filter(F.col("event_type").isin("purchase", "click"))
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.floor(F.col("value") * 1e2 + 0.5).cast("long").alias("cents"),
            F.least(
                F.lit(_DECAY_CAP).cast("long"),
                F.floor(
                    F.floor(
                        (F.col("ref_us") - F.unix_micros("ts")) / _US_PER_DAY
                    )
                    / 7
                ).cast("long"),
            ).alias("k"),
        )
    )
    # pyspark's shiftleft() helper takes only a literal bit count; the
    # SQL function accepts a column expression
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_DECAY_CAP} - k AS INT))")
    agg = w.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("cents").cast("decimal(38,0)") * weight.cast("decimal(38,0)"))
        .cast("double")
        .alias("wsum"),
    )
    return agg.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        (
            F.floor(F.col("wsum") / ((1 << _DECAY_CAP) * 100.0) * 1e6 + 0.5)
            .cast("long")
            / F.lit(1e6)
        ).alias("decay_score"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# VWAP — volume-weighted average price, running per month
# ---------------------------------------------------------------------------

_VWAP_ORACLE = """
WITH daily AS (
  SELECT CAST(CAST(date_trunc('day', l_shipdate) AS DATE) AS STRING)
             AS day_str,
         strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
             * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS pv_u,
         SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS vol
  FROM lineitem GROUP BY 1, 2
),
run AS (
  SELECT day_str, month, vol,
         SUM(pv_u) OVER w AS run_pv,
         SUM(vol) OVER w AS run_vol
  FROM daily
  WINDOW w AS (PARTITION BY month ORDER BY day_str
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT day_str, month, CAST(vol AS BIGINT) AS day_volume,
       CAST(run_vol AS BIGINT) AS cum_volume,
       CAST(floor(CAST(run_pv AS DOUBLE) / 1e2 / run_vol * 1e6 + 0.5)
            AS BIGINT) / 1e6 AS vwap
FROM run
ORDER BY day_str
"""


@register("window_vwap", oracle=_VWAP_ORACLE)
def window_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running volume-weighted average price per calendar month (reset
    at month boundaries): cumulative Σ(price·qty)/Σ(qty) over the
    daily grid — the execution-quality benchmark of trading systems
    and the weighted-running-ratio template (cost-per-unit, blended
    CPM) everywhere else.

    Exactness: price quantized to 1e2 units and quantity to integers
    BEFORE the window, so both running sums are exact integers in both
    engines (DECIMAL-summed; a day's pv fits but a year's needs the
    wide type) and the ratio is formed once per row from identical
    integers, floor-quantized on output. Plan: one daily rollup
    (map-side partial), one window partitioned by month — the same
    key the rollup shuffled on.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pv = F.floor(F.col("l_extendedprice") * 1e2 + 0.5).cast("long") * F.floor(
        F.col("l_quantity") + 0.5
    ).cast("long")
    vol = F.floor(F.col("l_quantity") + 0.5).cast("long")
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").cast("date").cast("string").alias("day_str"),
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(pv).alias("pv_u"),
        F.sum(vol).alias("vol"),
    )
    w = (
        Window.partitionBy("month")
        .orderBy("day_str")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day_str",
        "month",
        F.col("vol").cast("long").alias("day_volume"),
        F.sum("vol").over(w).cast("long").alias("cum_volume"),
        (
            F.floor(
                F.sum("pv_u").over(w).cast("double")
                / 1e2
                / F.sum("vol").over(w)
                * 1e6
                + 0.5
            ).cast("long")
            / F.lit(1e6)
        ).alias("vwap"),
    ).orderBy("day_str")


# ---------------------------------------------------------------------------
# cohort LTV — cumulative revenue per signup cohort x month-age
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH first_order AS (
  SELECT o_custkey,
         MIN(date_trunc('month', o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort_month,
         (CAST(date_part('year', o.o_orderdate) AS BIGINT)
          - date_part('year', f.cohort_month)) * 12
         + (CAST(date_part('month', o.o_orderdate) AS BIGINT)
            - date_part('month', f.cohort_month)) AS month_age,
         SUM(CAST(floor(o.o_totalprice * 1e2 + 0.5) AS BIGINT)) AS rev_u,
         COUNT(DISTINCT o.o_custkey) AS active_customers
  FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
),
sized AS (
  SELECT cohort_month, COUNT(*) AS cohort_size FROM first_order GROUP BY 1
)
SELECT strftime(r.cohort_month, '%Y-%m') AS cohort,
       CAST(r.month_age AS BIGINT) AS month_age,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(r.active_customers AS BIGINT) AS active_customers,
       CAST(floor(CAST(SUM(r.rev_u) OVER (
           PARTITION BY r.cohort_month ORDER BY r.month_age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS DOUBLE) / 1e2 / s.cohort_size * 1e6 + 0.5) AS BIGINT) / 1e6
         AS cum_ltv_per_customer
FROM rev r JOIN sized s ON s.cohort_month = r.cohort_month
WHERE r.month_age <= 24
ORDER BY cohort, month_age
"""


@register("agg_cohort_ltv", oracle=_LTV_ORACLE)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month;
    for each cohort x month-age cell, active customers and CUMULATIVE
    revenue per cohort member — the curve every growth/retention
    dashboard draws next to `agg_retention_cohorts`' activity view.

    Plan: first-order month is one groupBy on custkey; the fact joins
    it on the same key (exchange reuse), rolls up to cohort x age
    (map-side partial), and one running-sum window per cohort
    finishes. Revenue is 1e2-unit integer-exact; the per-customer
    normalization divides once by the broadcast cohort size.
    """
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    sized = first.groupBy("cohort_month").agg(F.count("*").alias("cohort_size"))
    age = (F.year("o_orderdate") - F.year("cohort_month")) * 12 + (
        F.month("o_orderdate") - F.month("cohort_month")
    )
    rev = (
        orders.join(first, "o_custkey")
        .groupBy("cohort_month", age.cast("long").alias("month_age"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1e2 + 0.5).cast("long")
            ).alias("rev_u"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(sized), "cohort_month")
        .filter(F.col("month_age") <= 24)
        .select(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
            F.col("month_age").cast("long").alias("month_age"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("active_customers").cast("long").alias("active_customers"),
            (
                F.floor(
                    F.sum("rev_u").over(w).cast("double")
                    / 1e2
                    / F.col("cohort_size")
                    * 1e6
                    + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort", "month_age")
    )
