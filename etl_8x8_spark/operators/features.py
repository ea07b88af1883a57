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
