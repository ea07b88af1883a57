"""Join operators (SURVEY.md §2b "Joins").

Strategy posture for 100 TB:
- dim tables (nation/region/bands) are broadcast — zero shuffle of the
  fact side (generalizes the reference's in-process SSM memo cache,
  R10, ``common/aws_utils/ssm.py:65-71``: ship the small table to
  every worker once).
- fact-fact equi joins shuffle on the join key; AQE picks
  sort-merge vs shuffled-hash at runtime and splits skewed partitions
  (``spark.sql.adaptive.skewJoin.enabled``).
- the as-of join is a union + running last_value over one window —
  ONE shuffle on (user_id), no join explosion, the scale-correct
  pattern when per-key event counts are unbounded.
- the salted-join demo shows the manual skew remedy: replicate the
  dim side per salt bucket, derive a deterministic salt on the fact
  side, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8x8_spark.functions.parity import DEC
from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table


@register(
    "join_broadcast_lookup",
    oracle="""
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim enrichment via broadcast hash join (R10 kv-lookup
    generalized: reference ``ssm.py:46-73`` memoizes single-key
    lookups; the engine ships the whole dim to every executor)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "inner",
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_hash_equi",
    oracle="""
SELECT o_orderkey, o_orderpriority, l_linenumber, l_extendedprice
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
""",
)
def join_hash_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join: both sides shuffle on the key; AQE picks
    the physical strategy (sort-merge vs shuffled-hash) and coalesces
    post-shuffle partitions at runtime."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        "o_orderkey", "o_orderpriority", "l_linenumber", "l_extendedprice"
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter (left semi): R11's present-keys semantics —
    bulk lookup returns only keys that exist
    (reference ``ssm.py:98-99``). No columns from the right side, no
    row duplication, right side reduced to distinct keys before the
    probe."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-key detection (left anti): customers with no orders in
    the opening half-year — R11's silently-absent keys (reference test
    semantics at ``tests/.../test_ssm.py:25-30``). The right side is
    date-sliced because EVERY customer has some order at every SF, so
    the unsliced anti join was vacuously empty at sf0.01 and verified
    nothing (LESSONS.md #20); the filter pushes to the orders scan
    before the anti join's key dedup.
    """
    customer = load_table(spark, sf_dir, "customer")
    early = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-07-01"
    )
    return customer.join(
        early, customer.c_custkey == early.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_BANDS = [
    ("budget", 0.0, 1000.0),
    ("mid", 1000.0, 2000.0),
    ("premium", 2000.0, 10_000_000.0),
]

_RANGE_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 1000.0),
         ('mid', 1000.0, 2000.0),
         ('premium', 2000.0, 10000000.0)
)
SELECT p_partkey, p_name, band
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
"""


@register("join_range_theta", oracle=_RANGE_ORACLE)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) predicate join: price banding.

    The band table is tiny -> broadcast nested-loop join, which is the
    right physical plan: every row tests 3 band predicates, no shuffle.
    A large-large range join would instead bucketize the range key and
    equi-join on bucket (see SNIPPETS/Spark docs pattern); not needed
    for a 3-row dim.
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    cond = (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi)
    return part.join(F.broadcast(bands), cond, "inner").select(
        "p_partkey", "p_name", "band"
    )


_ASOF_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       (SELECT c.event_id FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id
FROM events p
WHERE p.event_type = 'purchase'
"""


@register("join_asof_event", oracle=_ASOF_ORACLE)
def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the latest click by the
    same user at-or-before the purchase timestamp.

    Implemented as union + running ``last_value(ignoreNulls)`` over a
    single (user_id, ts) window: one shuffle, linear in events, no
    per-key join explosion — the pattern that survives 100 TB where a
    join + row_number would materialize |clicks|x|purchases| pairs per
    user. Clicks sort before purchases at equal ts so a same-microsecond
    click is visible to the purchase (matching the oracle's ts <= ts).
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.lit(None).cast("long").alias("purchase_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"), F.col("event_id").alias("purchase_id")
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            # clicks (purchase_id null) first within a timestamp tie
            F.col("purchase_id").asc_nulls_first(),
            F.col("click_id"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("purchase_id").isNotNull())
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("last_click_id"),
        )
    )


_BUCKETED_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("join_bucketed_colocated", oracle=_BUCKETED_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with both sides bucketed on the join key —
    the shuffle-FREE variant of ``join_hash_equi``.

    Both tables are stored bucketed (8 buckets, same key, sorted), so
    the join plan contains no Exchange at all: task i sort-merges
    bucket i of each side locally (asserted in tests/test_plans.py).
    This is the storage layout BASELINE.md prescribes for every
    repeated fact-fact join at 100 TB: one bucketed write amortized
    over every downstream join. Result checked against the plain
    (shuffled) join's oracle — layout must never change answers.
    """
    from etl_8x8_spark.functions.parity import dsum
    from etl_8x8_spark.sources.bucketing import bucketed_orders_lineitem

    orders, lineitem = bucketed_orders_lineitem(spark, sf_dir)
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


_SALT_BUCKETS = 8

_SALTED_ORACLE = """
SELECT c.user_id,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN c.ts <= p.ts THEN 1 ELSE 0 END) AS BIGINT) AS n_click_first
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
GROUP BY c.user_id
"""


@register("join_salted_skew", oracle=_SALTED_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated large-large self-join: clicks ⋈ purchases on the
    hot ``user_id`` key.

    Both sides are fact-sized (neither broadcasts at scale) and
    user_id is low-cardinality, so an unsalted shuffle puts each user's
    whole pair-explosion in one task. Remedy: salt the bigger side
    deterministically (clicks, salt = event_id % B) and replicate the
    smaller side once per salt bucket, then join on (key, salt) — every
    hot key now spreads over B tasks. Result is identical to the
    unsalted join, which is exactly what the oracle checks. At 100 TB
    try AQE skew-join first; manual salting is for when one key
    dominates even a split partition or the skew survives into a
    post-join aggregation.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    salted_clicks = clicks.withColumn(
        "salt", (F.col("event_id") % _SALT_BUCKETS).cast("int")
    )
    replicated_purchases = purchases.crossJoin(
        spark.range(_SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        salted_clicks.join(
            replicated_purchases,
            (salted_clicks.user_id == replicated_purchases.p_user_id)
            & (salted_clicks.salt == replicated_purchases.salt),
            "inner",
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("ts") <= F.col("p_ts"), 1).otherwise(0)).alias(
                "n_click_first"
            ),
        )
    )


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers
FROM (SELECT c_custkey, c_nationkey FROM customer) c
FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
  ON c.c_nationkey = s.s_nationkey
GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with coalesced keys: nations appearing on
    either side survive; the aggregation counts the matched rows per
    side (COUNT over a nullable column skips the unmatched nulls)."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    joined = customer.join(
        supplier, customer.c_nationkey == supplier.s_nationkey, "full"
    )
    key = F.coalesce(customer.c_nationkey, supplier.s_nationkey)
    return joined.groupBy(key.alias("nationkey")).agg(
        F.count("c_custkey").alias("n_customers"),
        F.count("s_suppkey").alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# Point-in-time (SCD2) dimension join
# ---------------------------------------------------------------------------

# Deterministic synthetic version history: every customer has 3
# versions of a "tier" attribute, each valid for one of three fixed
# eras. Era boundaries chosen inside the orders date range.
_SCD2_ERAS = [
    ("1992-01-01 00:00:00", "1995-01-01 00:00:00", 0),
    ("1995-01-01 00:00:00", "1997-01-01 00:00:00", 1),
    ("1997-01-01 00:00:00", "1999-01-01 00:00:00", 2),
]

_SCD2_ORACLE = """
WITH eras(valid_from, valid_to, version) AS (
  VALUES (TIMESTAMP '1992-01-01', TIMESTAMP '1995-01-01', 0),
         (TIMESTAMP '1995-01-01', TIMESTAMP '1997-01-01', 1),
         (TIMESTAMP '1997-01-01', TIMESTAMP '1999-01-01', 2)
),
dim AS (
  SELECT c_custkey, valid_from, valid_to, version,
         CASE (c_custkey + version) % 3
           WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver' ELSE 'gold'
         END AS tier
  FROM customer, eras
)
SELECT o_orderkey, o_custkey, d.version AS dim_version, d.tier
FROM orders o
JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.valid_from
 AND o.o_orderdate <  d.valid_to
"""


@register("join_dim_scd2", oracle=_SCD2_ORACLE)
def join_dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against a slowly-changing (SCD2) dimension:
    each order picks up the dimension version whose validity interval
    contains the order date — never a later one. This is the join that
    keeps training features leak-free: an order from 1996 must see the
    1995-96 customer tier, not today's.

    The versioned dim is synthesized deterministically (3 fixed eras ×
    customers, tier = f(custkey, version)) so both engines build the
    identical dimension. Join shape: equi on the entity key carries
    the join; the interval test is a cheap residual filter — per-key
    fanout is bounded by versions-per-entity (3), so there is no range
    explosion, and at 100 TB the dim side stays broadcastable as long
    as entity×version fits (else it shuffles on the SAME equi key and
    stays co-partitioned).
    """
    customer = load_table(spark, sf_dir, "customer")
    eras = spark.createDataFrame(
        [(f, t, v) for f, t, v in _SCD2_ERAS],
        "valid_from string, valid_to string, version int",
    ).select(
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "version",
    )
    dim = customer.select("c_custkey").crossJoin(F.broadcast(eras)).select(
        "c_custkey",
        "valid_from",
        "valid_to",
        "version",
        F.element_at(
            F.array(F.lit("bronze"), F.lit("silver"), F.lit("gold")),
            ((F.col("c_custkey") + F.col("version")) % 3 + 1).cast("int"),
        ).alias("tier"),
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.join(
        F.broadcast(dim),
        (orders.o_custkey == dim.c_custkey)
        & (orders.o_orderdate >= dim.valid_from)
        & (orders.o_orderdate < dim.valid_to),
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("version").alias("dim_version"),
        "tier",
    )


_ASOF_FWD_ORACLE = """
SELECT c.event_id AS click_id,
       c.user_id,
       (SELECT p.event_id FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND p.ts >= c.ts
        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase_id
FROM events c
WHERE c.event_type = 'click'
"""


@register("join_asof_forward", oracle=_ASOF_FWD_ORACLE)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the EARLIEST purchase by
    the same user at-or-after the click — the time-to-convert /
    next-action lookup, mirror image of ``join_asof_event``.

    Same single-shuffle union+window plan, run backwards: purchases
    sort before clicks at equal ts (so a same-microsecond purchase is
    visible), and a REVERSED cumulative frame (current row → unbounded
    following) with ``first(ignorenulls)`` picks the next purchase.
    Still one shuffle, linear in events, no per-key pair explosion.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            # purchases (click_id null) first within a timestamp tie
            F.col("click_id").asc_nulls_first(),
            F.col("purchase_id"),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.withColumn(
            "next_purchase_id", F.first("purchase_id", ignorenulls=True).over(w)
        )
        .filter(F.col("click_id").isNotNull())
        .select(
            F.col("click_id"),
            F.col("user_id"),
            F.col("next_purchase_id"),
        )
    )


_RB_WINDOW_US = 30 * 60 * 1_000_000  # ±30 minutes
_RB_BUCKET_US = 3_600 * 1_000_000  # 1-hour blocking buckets


@register(
    "join_range_bucketed",
    oracle=f"""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_nearby_clicks
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'click') c
  ON epoch_us(c.ts) >= epoch_us(p.ts) - {_RB_WINDOW_US}
 AND epoch_us(c.ts) <= epoch_us(p.ts) + {_RB_WINDOW_US}
GROUP BY p.event_id
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGE-LARGE range join via bucketization — the scale path
    ``join_range_theta``'s docstring promises: neither side broadcasts,
    so the pure theta predicate would be a cartesian. Each purchase
    instead equi-joins the 1-hour buckets its ±30-minute window can
    touch (its own and both neighbors — window ≤ bucket width, so 3
    probes cover every case), and the exact range predicate filters
    within the bucket. Pair work drops from |P|·|C| to
    |P|·(3·avg_bucket), and the join is a plain shuffle hash join on
    the bucket key.

    Per purchase: how many clicks (any user) within ±30 min — the
    activity-context feature. LEFT join keeps zero-click purchases
    (COUNT over the null column yields 0 on both engines).
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros(F.col("ts")).alias("p_us"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts")).alias("c_us"),
        (F.unix_micros(F.col("ts")) / _RB_BUCKET_US).cast("long").alias(
            "bucket"
        ),
    )
    probes = purchases.select(
        "purchase_id",
        "p_us",
        F.explode(
            F.array(
                (F.col("p_us") / _RB_BUCKET_US).cast("long") - 1,
                (F.col("p_us") / _RB_BUCKET_US).cast("long"),
                (F.col("p_us") / _RB_BUCKET_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    in_range = (F.col("c_us") >= F.col("p_us") - _RB_WINDOW_US) & (
        F.col("c_us") <= F.col("p_us") + _RB_WINDOW_US
    )
    return (
        probes.join(clicks, "bucket", "left")
        .withColumn("hit", F.when(in_range, F.col("click_id")))
        .groupBy("purchase_id")
        .agg(F.count("hit").alias("n_nearby_clicks"))
    )


_FUZZY_MAX_DIST = 2


@register(
    "join_fuzzy_match",
    oracle=f"""
WITH probes AS (  -- customer names with one character dropped
  SELECT c_custkey AS probe_id,
         substr(c_name, 1, 8) || substr(c_name, 10) AS probe_name
  FROM customer WHERE c_custkey % 100 = 0
),
cand AS (
  SELECT p.probe_id, p.probe_name, c.c_custkey, c.c_name,
         levenshtein(p.probe_name, c.c_name) AS dist
  FROM probes p JOIN customer c
    ON substr(p.probe_name, 1, 8) = substr(c.c_name, 1, 8)
)
SELECT probe_id, probe_name, c_custkey, c_name, CAST(dist AS INT) AS dist
FROM cand WHERE dist <= {_FUZZY_MAX_DIST}
""",
)
def join_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) entity matching — the record-linkage /
    entity-resolution join: corrupted probe names (one character
    dropped) matched back to the customer table within Levenshtein
    distance {_FUZZY_MAX_DIST}.

    The blocking discipline is the same as every dedup operator here:
    Levenshtein is O(len²) per PAIR, so it only ever runs on
    candidates sharing a cheap blocking key (the 8-char name prefix —
    production uses phonetic keys or q-gram LSH), never all-pairs.
    Blocked candidates equi-join; the distance is a residual filter.
    """
    customer = load_table(spark, sf_dir, "customer")
    probes = customer.filter(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(
            F.substring("c_name", 1, 8), F.expr("substring(c_name, 10)")
        ).alias("probe_name"),
    )
    cand = probes.join(
        customer,
        F.substring(F.col("probe_name"), 1, 8)
        == F.substring(F.col("c_name"), 1, 8),
    )
    dist = F.levenshtein("probe_name", "c_name")
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
        .select("probe_id", "probe_name", "c_custkey", "c_name", "dist")
    )

# --------------------------------------------------------------------------
# bloom-pruned join — hand-rolled runtime filter
# --------------------------------------------------------------------------

_BF_BITS = 1 << 20  # 1M bits = 16K longs = 128 KB broadcast
_BF_WORDS = _BF_BITS // 64
_BF_HASHES = 5


def _bf_probe_cond(key: str) -> str:
    """Unrolled probe predicate: 5 explicit array-index + bit tests,
    AND-chained. Deliberately NOT forall/transform — higher-order
    functions are interpreted per row, while this conjunction stays
    inside whole-stage codegen (measured 10× on the probe stage)."""
    tests = []
    for i in range(_BF_HASHES):
        p = f"pmod(xxhash64({key}, {i}), {_BF_BITS})"
        tests.append(
            f"(element_at(bf, CAST({p} div 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
        )
    return " AND ".join(tests)


@register(
    "join_bloom_pruned",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
""",
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join with a hand-rolled Bloom runtime filter: the
    selective side's keys fold into a 1M-bit Bloom bitmap (fixed
    128 KB however large the build side), and the probe side is pruned
    MAP-SIDE before its shuffle — the shuffle-volume reduction Spark's
    runtime row-level filtering performs internally, rebuilt from
    public built-ins (``bloom_filter_agg`` is not in the public
    function registry).

    The bitmap aggregates distributedly — per key 5 xxhash64
    positions, explode → ``bit_or`` per 64-bit word (one tiny shuffle
    over ≤16K word ids) — and the ≤16K sparse words then materialize
    at the DRIVER into one dense 128 KB array that re-enters the plan
    as a broadcast 1-row DataFrame. That driver hop is not a
    driver-loop anti-pattern: it is bounded by the FILTER size (fixed
    128 KB, independent of data volume), and it is exactly how Spark's
    own runtime filters move a subquery result onto the probe side.
    The probe is 5 hashes + 5 O(1) array indexes per row, fully
    codegen'd (see ``_bf_probe_cond``). False positives are removed by
    the exact join that follows (hinted sort-merge: at 100 TB the
    filtered build side outgrows broadcast, which is exactly when a
    Bloom prune pays; at ~20% selectivity the probe shuffle shrinks
    ~5×). False negatives are impossible, so the result equals the
    plain join — which is the oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )

    positions = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64("o_orderkey", F.lit(i)), F.lit(_BF_BITS))
                for i in range(_BF_HASHES)
            ]
        )
    )
    sparse = (
        sel.select(positions.alias("pos"))
        .groupBy(F.expr("CAST(pos div 64 AS INT)").alias("word"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias("bits"))
        .collect()
    )
    dense = [0] * _BF_WORDS
    for row in sparse:
        dense[row.word] = row.bits
    bf = spark.createDataFrame([(dense,)], "bf ARRAY<BIGINT>")

    pruned = (
        lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .crossJoin(F.broadcast(bf))
        .filter(F.expr(_bf_probe_cond("l_orderkey")))
        .drop("bf")
    )
    return pruned.join(
        sel.hint("merge"), pruned.l_orderkey == sel.o_orderkey
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderpriority")

_ASOF_NEAREST_ORACLE = """
SELECT c.event_id AS click_id,
       c.user_id,
       np.event_id AS nearest_purchase_id,
       np.delta_us
FROM events c
LEFT JOIN LATERAL (
  SELECT p.event_id,
         abs(epoch_us(p.ts) - epoch_us(c.ts)) AS delta_us
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
  ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)) ASC, p.ts ASC,
           p.event_id ASC
  LIMIT 1
) np ON TRUE
WHERE c.event_type = 'click'
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for every click, the purchase by the same
    user closest in time in EITHER direction (pandas
    ``merge_asof(direction='nearest')``) — the sensor-alignment /
    attribution shape where "latest before" is wrong half the time.

    Composed from the two directional as-ofs in ONE union + one
    shuffle: a backward pass (cumulative frame, ``last(ignorenulls)``)
    finds the latest purchase at-or-before each click, a forward pass
    (reversed frame, ``first(ignorenulls)``) finds the earliest
    at-or-after, and a codegen'd CASE picks whichever is nearer in
    microseconds (ties -> the earlier side, matching the oracle's
    ``ORDER BY delta, ts``). The two window specs share the partition
    key, so Catalyst plans ONE Exchange and two local sorts — still
    linear in events, no per-key pair explosion.

    Tie-break detail: within one timestamp the backward sort places
    purchases DESC by event_id so ``last`` picks the smallest id,
    while the forward sort places them ASC so ``first`` does — both
    sides therefore agree with the oracle's ``event_id ASC`` at equal
    delta.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases).withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts_us",
            # purchases before clicks at equal ts; among equal-ts
            # purchases, DESC id so last() lands on the smallest
            F.col("click_id").asc_nulls_first(),
            F.col("purchase_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts_us",
            F.col("click_id").asc_nulls_first(),
            F.col("purchase_id").asc(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_id = F.last("purchase_id", ignorenulls=True).over(w_back)
    prev_ts = F.last(
        F.when(F.col("purchase_id").isNotNull(), F.col("ts_us")),
        ignorenulls=True,
    ).over(w_back)
    next_id = F.first("purchase_id", ignorenulls=True).over(w_fwd)
    next_ts = F.first(
        F.when(F.col("purchase_id").isNotNull(), F.col("ts_us")),
        ignorenulls=True,
    ).over(w_fwd)
    scored = (
        merged.withColumn("prev_id", prev_id)
        .withColumn("prev_d", F.col("ts_us") - prev_ts)
        .withColumn("next_id", next_id)
        .withColumn("next_d", next_ts - F.col("ts_us"))
        .filter(F.col("click_id").isNotNull())
    )
    take_prev = F.col("prev_id").isNotNull() & (
        F.col("next_id").isNull() | (F.col("prev_d") <= F.col("next_d"))
    )
    return scored.select(
        "click_id",
        "user_id",
        F.when(take_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("nearest_purchase_id"),
        F.when(take_prev, F.col("prev_d"))
        .otherwise(F.col("next_d"))
        .alias("delta_us"),
    )


_IV_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap
_IV_PAD_US = 24 * 3600 * 1_000_000  # ±24h attribution window per session

_INTERVAL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
seq AS (
  SELECT user_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_IV_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts,
         SUM(ns) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
),
iv AS (
  SELECT user_id, event_type, CAST(sid AS BIGINT) AS sid,
         MIN(epoch_us(ts)) - {_IV_PAD_US} AS s,
         MAX(epoch_us(ts)) + {_IV_PAD_US} AS e
  FROM sess GROUP BY user_id, event_type, sid
)
SELECT a.user_id,
       a.sid AS click_session,
       b.sid AS purchase_session,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id = b.user_id
 AND a.s <= b.e AND b.s <= a.e
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""


@register("join_interval_overlap", oracle=_INTERVAL_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join: each user's click sessions
    against their purchase sessions — both padded to a ±24 h
    attribution window — emitting every overlapping pair with its
    overlap duration. This is the interval-join primitive (Flink's
    interval join, Postgres ``&&``) that point-in-range joins
    (``join_range_theta``/``join_range_bucketed``) cannot express:
    BOTH sides have extent.

    Sessions for both event types derive in ONE window pass keyed by
    (user_id, event_type) — the key includes the type, so one shuffle
    sessionizes both sides — then one groupBy collapses sessions to
    padded [min_ts − 24h, max_ts + 24h] intervals and the overlap
    join is a user_id equi-join with the symmetric predicate
    a.s <= b.e AND b.s <= a.e.

    Scale: the equi-join explodes per-user session PAIRS, which is
    bounded (sessions per user grows with a user's own activity, not
    the corpus); a hot user splits under AQE skew-join. If per-key
    interval counts were unbounded (machine traces, not users), the
    escalation is time-bucketed blocking exactly as
    ``join_range_bucketed`` demonstrates: explode each interval to
    its covered hours, equi-join on (key, hour), dedup pairs.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    ns = F.when(prev.isNull() | (us - prev >= _IV_GAP_US), 1).otherwise(0)
    sess = events.select(
        "user_id",
        "event_type",
        us.alias("ts_us"),
        ns.alias("_ns"),
    ).select(
        "user_id",
        "event_type",
        "ts_us",
        F.sum("_ns").over(wcum.orderBy("ts_us")).cast("long").alias("sid"),
    )
    iv = sess.groupBy("user_id", "event_type", "sid").agg(
        (F.min("ts_us") - _IV_PAD_US).alias("s"),
        (F.max("ts_us") + _IV_PAD_US).alias("e"),
    )
    a = iv.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("sid").alias("click_session"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = iv.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("sid").alias("purchase_session"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e")),
        )
        .select(
            "user_id",
            "click_session",
            "purchase_session",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_us"),
        )
    )


_NULL_SAFE_ORACLE = """
WITH c AS (
  SELECT c_custkey, NULLIF(c_nationkey % 8, 0) AS seg
  FROM customer
),
s AS (
  SELECT NULLIF(CAST(s_nationkey % 8 AS INT), 0) AS seg,
         COUNT(*) AS n_suppliers,
         MIN(s_suppkey) AS min_suppkey
  FROM supplier
  GROUP BY 1
)
SELECT c.seg AS seg, COUNT(*) AS n_customers,
       MIN(s.n_suppliers) AS n_suppliers,
       MIN(s.min_suppkey) AS min_suppkey
FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
GROUP BY c.seg
ORDER BY seg NULLS FIRST
"""


@register("join_null_safe", oracle=_NULL_SAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each OTHER instead of silently dropping — the semantics a
    changelog/dimension merge needs when "unknown" is itself a key.

    A plain equality join discards every NULL-keyed row on both sides
    (NULL = NULL is NULL); eqNullSafe hashes NULL as an ordinary key
    value, so the join stays a broadcast/shuffled HASH join — same
    plan shape, no fallback to a non-equi strategy. The aggregated
    supplier side is dim-sized and broadcasts. NULL keys all land in
    one task, which at 100 TB is a deliberate skew trade-off: if the
    unknown-key population is large, pre-split it before the join
    (see join_salted_skew).
    """
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(
        "c_custkey",
        F.nullif(F.col("c_nationkey") % F.lit(8), F.lit(0)).alias("seg"),
    )
    s = (
        supplier.select(
            F.nullif(
                (F.col("s_nationkey") % F.lit(8)).cast("int"), F.lit(0)
            ).alias("seg"),
            "s_suppkey",
        )
        .groupBy("seg")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.min("s_suppkey").alias("min_suppkey"),
        )
    )
    joined = c.join(
        F.broadcast(s.withColumnRenamed("seg", "s_seg")),
        c["seg"].eqNullSafe(F.col("s_seg")),
        "inner",
    )
    return (
        joined.groupBy("seg")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("n_suppliers").alias("n_suppliers"),
            F.min("min_suppkey").alias("min_suppkey"),
        )
        .orderBy(F.asc_nulls_first("seg"))
    )


_EXISTENCE_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 9000.0
   OR EXISTS (
     SELECT 1 FROM orders
     WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
   )
"""


@register("join_existence_mark", oracle=_EXISTENCE_SQL)
def join_existence_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence (mark) join: an EXISTS predicate OR'd with an
    ordinary filter. Neither a semi join (rows can survive WITHOUT a
    match, via the balance clause) nor a plain filter (the subquery
    must probe orders) — Catalyst compiles it to ExistenceJoin, which
    attaches a boolean mark column during the hash join and filters on
    the disjunction afterwards. One shuffle of the distinct urgent
    custkeys against customer; the orders side reduces to its key set
    before the join, so the exchange is keys-only at any scale. Plan
    pinned in tests/test_plans.py (ExistenceJoin, no nested loop).
    """
    from etl_8x8_spark.operators.sql_queries import register_table_views

    register_table_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_EXISTENCE_SQL)


_LATERAL_TOPK_SQL = """
SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@register("join_lateral_topk", oracle=_LATERAL_TOPK_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each
    customer joined to its own top-2 orders — the per-row-subquery
    surface SQL users reach for before they know the window rewrite.

    Catalyst decorrelates it into exactly the plan you'd hand-write:
    a row_number window over orders WITH a PARTIAL WindowGroupLimit
    below the exchange, so each map task forwards at most 2 rows per
    customer — the shuffle carries ≤ 2·|customers|·|input partitions|
    rows regardless of order volume. Pinned in tests/test_plans.py;
    deterministic via the o_orderkey tie-break.
    """
    from etl_8x8_spark.operators.sql_queries import register_table_views

    register_table_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_TOPK_SQL)


# ---------------------------------------------------------------------------
# feature-store point-in-time enrichment (N features, one shuffle)
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       (SELECT c.value FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value,
       (SELECT v.value FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
        WHERE e.event_type = 'error' AND e.user_id = p.user_id
          AND (e.ts < p.ts OR (e.ts = p.ts AND e.event_id < p.event_id)))
           AS errors_so_far
FROM events p
WHERE p.event_type = 'purchase'
"""


@register("join_feature_store_pit", oracle=_PIT_ORACLE)
def join_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time enrichment: attach N as-of features
    (latest prior click value, latest prior view value, error count so
    far) to every purchase with NO feature leakage from the future —
    the training-data-correctness primitive behind every feature
    store's "as of the label timestamp" join.

    The naive build is one as-of join per feature table — N shuffles
    and N window passes. This operator instead interleaves ALL event
    roles in a single (user_id, ts, event_id) sort: each feature is a
    running last_value(ignoreNulls) / running count over the SAME
    window, so N features cost ONE shuffle and one sort regardless of
    N — the pattern that survives 100 TB where per-feature joins
    multiply the shuffle bill by the feature count. Strictly-prior
    semantics (ties by event_id) come from frame ROWS ... 1 PRECEDING.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_v = F.when(F.col("event_type") == "click", F.col("value"))
    view_v = F.when(F.col("event_type") == "view", F.col("value"))
    err_1 = F.when(F.col("event_type") == "error", 1).otherwise(0)
    enriched = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(click_v, ignorenulls=True).over(w).alias("last_click_value"),
        F.last(view_v, ignorenulls=True).over(w).alias("last_view_value"),
        F.sum(err_1).over(w).alias("err_n"),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "last_click_value",
        "last_view_value",
        F.coalesce(F.col("err_n"), F.lit(0)).cast("long").alias("errors_so_far"),
    )


# ---------------------------------------------------------------------------
# end-to-end supervised training-data pipeline (PIT features → label →
# deterministic split → leakage-safe summary)
# ---------------------------------------------------------------------------

_FD_SPLIT_PCT = 80  # train share of the Knuth-hash split

_FEATURE_DATASET_ORACLE = f"""
WITH feats AS (
  SELECT p.event_id AS purchase_id,
         p.value,
         (SELECT c.value FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id
            AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value
  FROM events p
  WHERE p.event_type = 'purchase'
),
mean_v AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value)
             AS mv
  FROM feats
),
labeled AS (
  SELECT purchase_id,
         CASE WHEN ((purchase_id % 2147483648) * 2654435761)
                   % 4294967296 % 100 < {_FD_SPLIT_PCT}
              THEN 'train' ELSE 'test' END AS split,
         last_click_value IS NOT NULL AS had_click,
         CASE WHEN value >= m.mv THEN 1 ELSE 0 END AS label,
         last_click_value
  FROM feats CROSS JOIN mean_v m
)
SELECT split, had_click,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(floor(CAST(SUM(label) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
            AS BIGINT) / 1e6 AS label_rate,
       CAST(SUM(CAST(coalesce(last_click_value, 0) AS DECIMAL(30,6)))
            AS DOUBLE) / COUNT(*) AS avg_click_value
FROM labeled
GROUP BY split, had_click
ORDER BY split, had_click
"""


@register("pipeline_feature_dataset", oracle=_FEATURE_DATASET_ORACLE)
def pipeline_feature_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supervised-training-data pipeline end to end, in ONE plan:
    point-in-time feature attachment (no future leakage), scale-free
    labeling (purchase value above the corpus mean), a deterministic
    Knuth-hash 80/20 train/test split, and the per-split class-
    balance / feature-coverage summary a dataset card reports.

    Plan: the PIT features ride the single-shuffle union-window
    pattern (join_feature_store_pit); the label threshold is a 1-row
    broadcast; the split is a pure expression on the row id (same
    masked Knuth hash as sample_train_test_split — the same row
    always lands in the same split, shard-count independent); and
    the summary is a 4-group aggregate. Catalyst fuses all of it
    into one window pass + two small aggregates — no operator
    boundary materializes anything.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_v = F.when(F.col("event_type") == "click", F.col("value"))
    feats = (
        events.select(
            "event_id",
            "event_type",
            "value",
            F.last(click_v, ignorenulls=True).over(w).alias("last_click_value"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "value", "last_click_value"
        )
    )
    mean_v = feats.agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value")).alias(
            "mv"
        )
    )
    split = F.when(
        ((F.col("purchase_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
        % 100
        < _FD_SPLIT_PCT,
        "train",
    ).otherwise("test")
    labeled = feats.crossJoin(F.broadcast(mean_v)).select(
        split.alias("split"),
        F.col("last_click_value").isNotNull().alias("had_click"),
        F.when(F.col("value") >= F.col("mv"), 1).otherwise(0).alias("label"),
        "last_click_value",
    )
    return (
        labeled.groupBy("split", "had_click")
        .agg(
            F.count("*").cast("long").alias("n"),
            (
                F.floor(
                    F.sum("label").cast("double") / F.count("*") * 1e6 + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("label_rate"),
            (
                F.sum(
                    F.coalesce(F.col("last_click_value"), F.lit(0.0)).cast(DEC)
                ).cast("double")
                / F.count("*")
            ).alias("avg_click_value"),
        )
        .orderBy("split", "had_click")
    )


# ---------------------------------------------------------------------------
# referential-integrity audit
# ---------------------------------------------------------------------------

_RI_ORACLE = """
SELECT 'lineitem.l_orderkey -> orders' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans,
       CAST(floor(CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5) AS BIGINT) / 1e6
           AS orphan_rate
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(floor(CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5) AS BIGINT) / 1e6
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'orders.o_custkey -> customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(floor(CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5) AS BIGINT) / 1e6
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY relationship
"""


@register("quality_referential_integrity", oracle=_RI_ORACLE)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's foreign
    keys: per relationship, the child row count, orphaned-key count,
    and orphan rate — the first report run against any new 100 TB
    drop, and the one that decides whether downstream inner joins
    silently drop data.

    Plan: each relationship is ONE left join probed only for parent
    NULLness — the parent side projects just its key, so the
    broadcast (dims) or shuffle (fact-fact) carries keys, not rows,
    and the per-relationship aggregate is a 1-row partial-combined
    count. Rates are exact-integer ratios, floor-quantized. Adding a
    relationship is one more UNION arm; nothing is quadratic in
    anything.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")

    def audit(child, ckey, parent, pkey, label):
        pk = parent.select(F.col(pkey))
        j = child.select(F.col(ckey)).join(
            pk, F.col(ckey) == F.col(pkey), "left"
        )
        orphans = F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
        return j.agg(
            F.lit(label).alias("relationship"),
            F.count("*").cast("long").alias("n_child_rows"),
            orphans.cast("long").alias("n_orphans"),
            (
                F.floor(
                    orphans.cast("double") / F.count("*") * 1e6 + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("orphan_rate"),
        ).select("relationship", "n_child_rows", "n_orphans", "orphan_rate")

    return (
        audit(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey -> orders")
        .unionByName(
            audit(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey -> part")
        )
        .unionByName(
            audit(
                orders, "o_custkey", cust, "c_custkey", "orders.o_custkey -> customer"
            )
        )
        .orderBy("relationship")
    )


# ---------------------------------------------------------------------------
# grid-blocked proximity join (the spatial/metric epsilon-join pattern)
# ---------------------------------------------------------------------------

# Epsilon box: purchases within $5 AND 1 hour of each other. Grid cells
# are exactly the epsilon sizes, so any qualifying pair lands in the
# same or an adjacent cell — candidate generation probes the 3x3 cell
# neighborhood (one side explodes 9 offsets, then a plain equi-join)
# and an exact predicate verifies. All arithmetic is integer (cents /
# micros), so cell assignment is deterministic in both engines.
_PROX_EPS_CENTS = 500
_PROX_EPS_US = 3_600_000_000

_GRID_PROX_ORACLE = f"""
WITH pts AS (
  SELECT event_id,
         CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS tus
  FROM events WHERE event_type = 'purchase'
),
cells AS (
  SELECT event_id, cents, tus,
         cents // {_PROX_EPS_CENTS} AS gx,
         tus // {_PROX_EPS_US} AS gy
  FROM pts
),
probes AS (
  SELECT event_id, cents, tus, gx + dx.d AS gx, gy + dy.d AS gy
  FROM cells
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
)
SELECT a.event_id AS event_a, b.event_id AS event_b,
       CAST(abs(a.cents - b.cents) AS BIGINT) AS d_cents,
       CAST(abs(a.tus - b.tus) AS BIGINT) AS d_us
FROM probes a JOIN cells b ON a.gx = b.gx AND a.gy = b.gy
WHERE a.event_id < b.event_id
  AND abs(a.cents - b.cents) <= {_PROX_EPS_CENTS}
  AND abs(a.tus - b.tus) <= {_PROX_EPS_US}
ORDER BY event_a, event_b
"""


@register("join_grid_proximity", oracle=_GRID_PROX_ORACLE)
def join_grid_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-proximity self-join over a 2-D point set (price x
    time): every pair of purchases within $5 AND one hour — the
    grid-blocked form of the spatial join (geohash buckets, H3 cells,
    trajectory matching all reduce to it).

    Plan: cell ids are integer floor-divisions of exact cent/micro
    coordinates at epsilon granularity, so qualifying pairs are
    guaranteed to fall in adjacent cells; one side explodes its 3x3
    cell neighborhood (a 9x row multiplication of the SMALL projected
    point set, ids + 2 ints) and candidates come from a plain
    equi-join on cell id — never an all-pairs cross. The exact
    epsilon-box predicate then verifies candidates. At 100 TB the
    equi-join shuffles both sides on cell id; skewed (dense) cells
    split via AQE skew handling, and epsilon sets the work bound:
    cost = sum over cells of |cell| x |3x3 neighborhood|.
    """
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.floor(F.col("value") * 1e2 + 0.5).cast("long").alias("cents"),
            F.unix_micros("ts").alias("tus"),
        )
    )
    cells = pts.select(
        "event_id",
        "cents",
        "tus",
        F.floor(F.col("cents") / _PROX_EPS_CENTS).cast("long").alias("gx"),
        F.floor(F.col("tus") / _PROX_EPS_US).cast("long").alias("gy"),
    )
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx} AS dx, {dy} AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probes = cells.select("event_id", "cents", "tus", "gx", "gy", offsets.alias("o")).select(
        "event_id",
        "cents",
        "tus",
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
    )
    a, b = probes.alias("a"), cells.alias("b")
    d_cents = F.abs(F.col("a.cents") - F.col("b.cents"))
    d_us = F.abs(F.col("a.tus") - F.col("b.tus"))
    return (
        a.join(b, (F.col("a.gx") == F.col("b.gx")) & (F.col("a.gy") == F.col("b.gy")))
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (d_cents <= _PROX_EPS_CENTS)
            & (d_us <= _PROX_EPS_US)
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            d_cents.cast("long").alias("d_cents"),
            d_us.cast("long").alias("d_us"),
        )
        .orderBy("event_a", "event_b")
    )


# ---------------------------------------------------------------------------
# join-key skew report — the "do I need to salt this" diagnostic
# ---------------------------------------------------------------------------

def _skew_oracle_one(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS join_key,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
       CAST(floor(CAST(MAX(cnt) AS DOUBLE)
                  / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*))
                  * 1e6 + 0.5) AS BIGINT) / 1e6 AS skew_ratio
FROM (SELECT {col}, COUNT(*) AS cnt FROM {table} GROUP BY {col}) t
"""


_SKEW_KEYS = [
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]

_SKEW_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(f"({_skew_oracle_one(t, c)})" for t, c in _SKEW_KEYS)
    + ") ORDER BY join_key"
)


@register("quality_key_skew_report", oracle=_SKEW_ORACLE)
def quality_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile across the schema's four fact join keys:
    per key, total rows, distinct keys, the hottest key's row count,
    and the skew ratio (hottest / average) — the diagnostic that
    decides between a plain shuffle join, AQE skew splitting, and
    manual salting (`join_salted_skew`) BEFORE a 100 TB join runs for
    six hours on one straggler task.

    Plan: each key profiles with one partial-aggregated groupBy
    collapsed to a 1-row summary — per-key cost is a scan plus a
    |keys|-row exchange; the four summaries union. The same numbers
    feed AQE's skew thresholds; ratios are floor-quantized.
    """

    def one(table: str, col: str) -> DataFrame:
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
        )
        return per_key.agg(
            F.lit(f"{table}.{col}").alias("join_key"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_key_rows"),
            (
                F.floor(
                    F.max("cnt").cast("double")
                    / (F.sum("cnt").cast("double") / F.count("*"))
                    * 1e6
                    + 0.5
                ).cast("long")
                / F.lit(1e6)
            ).alias("skew_ratio"),
        )

    out = one(*_SKEW_KEYS[0])
    for t, c in _SKEW_KEYS[1:]:
        out = out.unionByName(one(t, c))
    return out.orderBy("join_key")
