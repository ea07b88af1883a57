"""Sort / limit / set-operation operators (SURVEY.md §2b).

``sort_limit_topk`` is the global-top-K pattern: Spark compiles
``orderBy().limit(k)`` to TakeOrderedAndProject — each partition keeps
a k-row heap, the driver merges heaps; no global sort, no shuffle of
the full table. The set ops generalize R5's success∪error stream merge
(reference ``api_gateway.py:99-123``: one output stream built from two
disjoint record populations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8x8_spark.functions.parity import DEC
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
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders
WHERE o_orderpriority = '1-URGENT'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered but never urgently (distinct EXCEPT).

    The original nations-without-suppliers framing was vacuously empty
    at every SF (all 25 nations have both) — an empty result
    hash-matches without verifying anything (LESSONS.md #20); this
    slice is ~10% of customers at every SF.
    """
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select(F.col("o_custkey").alias("custkey"))
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("custkey"))
    return all_c.subtract(urgent)


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


# --------------------------------------------------------------------------
# mixture rebalancing — data-derived stratified sampling
# --------------------------------------------------------------------------

# Acceptance is integer-exact: bucket ∈ [0, 1e6) from the same masked
# Knuth hash as sample_systematic; accept iff bucket * lang_count <
# min_count * 1e6, i.e. rate = min/count with the rarest language kept
# at 100%. bucket < 1e6 and counts ≤ ~1e12 keep the products far from
# Long overflow at any realistic corpus size.
_MIX_M = 1_000_000

_MIX_ORACLE = f"""
WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT MIN(cnt) AS mn FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN c USING (lang) CROSS JOIN m
WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 % {_MIX_M} * c.cnt
      < m.mn * {_MIX_M}
"""


@register("sample_mixture_rebalance", oracle=_MIX_ORACLE)
def sample_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance a skewed corpus toward a UNIFORM language mixture by
    deterministic downsampling — the training-data mixture op.

    Unlike ``sample_systematic`` (static per-class rates), the
    acceptance rates here are DATA-DERIVED at runtime: per-language
    counts are aggregated, the rarest language is kept at 100%, and
    every other language is thinned to match (rate = min_count /
    lang_count). Membership is the same masked Knuth hash of the row
    id — reproducible across runs, engines, and repartitions — and the
    accept test is pure integer arithmetic (no float rate, no rand()).

    Scale: the rate table is a 5-row aggregate (partial+final on a
    low-cardinality key) broadcast back onto the corpus; the sample
    itself is a map-side filter. At 100 TB this is one cheap stats
    pass + one narrow pass, the same shape mixture-weighted corpus
    construction uses in production.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("mn"))
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % _MIX_M
    return (
        docs.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(mn))
        .filter(bucket * F.col("cnt") < F.col("mn") * _MIX_M)
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# temperature-scaled mixture sampling — the multilingual-pretraining op
# --------------------------------------------------------------------------

# Expected sampled count ∝ count^ALPHA (temperature sampling, the
# public multilingual-pretraining recipe: up-weight rare languages
# without flattening to uniform). Acceptance rate per language is
# (min_count / count)^(1-ALPHA), normalized so the rarest language is
# kept at 100%; ALPHA=0.5 → rate = sqrt(min/count). The rate is
# quantized to ppm through correctly-rounded IEEE double sqrt/division
# (bit-identical across engines), and membership is the same masked
# Knuth hash as sample_systematic — reproducible across runs, engines,
# and repartitions.
_TEMP_ALPHA = 0.5

_TEMP_ORACLE = f"""
WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT MIN(cnt) AS mn FROM c),
r AS (
  SELECT lang, cnt,
         CAST(floor(sqrt(CAST(mn AS DOUBLE) / cnt) * {_MIX_M} + 0.5)
              AS BIGINT) AS rate_ppm
  FROM c CROSS JOIN m
)
SELECT r.lang,
       CAST(r.cnt AS BIGINT) AS n_rows,
       r.rate_ppm,
       CAST(COUNT(CASE WHEN ((d.doc_id % 2147483648) * 2654435761)
                            % 4294967296 % {_MIX_M} < r.rate_ppm
                       THEN 1 END) AS BIGINT) AS n_sampled
FROM documents d JOIN r USING (lang)
GROUP BY r.lang, r.cnt, r.rate_ppm
ORDER BY r.lang
"""


@register("sample_temperature_mixture", oracle=_TEMP_ORACLE)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (expected sampled count ∝
    count^α, α=0.5) — the standard multilingual-pretraining sampler:
    rare languages are up-weighted relative to their natural share
    without flattening the mixture to uniform (that is
    ``sample_mixture_rebalance``, the α→0 limit; α=1 is the raw
    corpus). Output audits each language's natural count, its ppm
    acceptance rate, and the realized sample size.

    Determinism: rate_ppm goes through correctly-rounded IEEE double
    division+sqrt (bit-identical in Spark and DuckDB) then integer
    floor; membership is the masked Knuth hash of doc_id — no rand(),
    no order dependence.

    Scale: per-language counts are a low-cardinality partial+final
    aggregate; the |langs|-row rate table broadcasts back onto the
    corpus scan, so sampling is map-side — one stats pass + one narrow
    pass at any corpus size, same shape as production mixture
    construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("mn"))
    rates = (
        counts.crossJoin(F.broadcast(mn))
        .select(
            "lang",
            "cnt",
            F.floor(
                F.sqrt(F.col("mn").cast("double") / F.col("cnt")) * _MIX_M
                + 0.5
            )
            .cast("long")
            .alias("rate_ppm"),
        )
    )
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % _MIX_M
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "cnt", "rate_ppm")
        .agg(
            F.count(F.when(bucket < F.col("rate_ppm"), 1))
            .cast("long")
            .alias("n_sampled")
        )
        .select(
            "lang",
            F.col("cnt").cast("long").alias("n_rows"),
            "rate_ppm",
            "n_sampled",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# per-group cap — "domain capping" for corpus balance
# --------------------------------------------------------------------------

_CAP_N = 10


@register(
    "sample_group_cap",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296,
                    doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_CAP_N}
""",
)
def sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) cap: keep at most N documents per group,
    chosen by Knuth-hash order of doc_id (deterministic — the same
    docs survive on every run/engine/partitioning; doc_id breaks the
    zero-probability hash ties). This is "domain capping" from
    pre-training corpus curation: no single source may dominate the
    mixture, and because membership is hash-decided the cap composes
    with the other deterministic samplers.

    Scale: one shuffle on (lang, source). The ``rn <= N`` filter on a
    rank-function window triggers Spark's WindowGroupLimit rewrite —
    each map task keeps only its local top-N per group BEFORE the
    shuffle, so a 100 TB corpus moves at most N x groups x tasks rows
    instead of everything (asserted in tests/test_plans.py). A
    hot-group skew therefore caps itself: the reduce side receives
    only pre-limited runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(
        bucket.asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _CAP_N)
    )


# --------------------------------------------------------------------------
# train/val/test split — deterministic disjoint partition
# --------------------------------------------------------------------------

_SPLIT_TRAIN, _SPLIT_VAL = 80, 90  # /100: 80% train, 10% val, 10% test


@register(
    "sample_train_test_split",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN b < {_SPLIT_TRAIN} THEN 'train'
            WHEN b < {_SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 AS b
  FROM documents
)
""",
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition the corpus into disjoint, exhaustive train/val/test
    splits (80/10/10) by Knuth-hash bucket of doc_id — every document
    lands in exactly one split, the assignment never changes across
    runs/engines/repartitions (no ``rand()``), and growing the corpus
    never moves an existing document between splits (no leakage when
    the pipeline re-runs on appended data — the property random or
    modulo-of-count splits lack).

    Scale: pure map-side projection, zero shuffle, pushes nothing but
    two columns through the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % 100
    split = (
        F.when(b < _SPLIT_TRAIN, F.lit("train"))
        .when(b < _SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


# --------------------------------------------------------------------------
# deterministic global shuffle into shards — the training-order op
# --------------------------------------------------------------------------

_SHUF_SHARDS = 16
_SHUF_SEED = 17

_SHUF_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         (((doc_id + {_SHUF_SEED}) % 2147483648) * 2654435761)
           % 4294967296 AS hv
  FROM documents
)
SELECT doc_id,
       CAST(hv % {_SHUF_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % {_SHUF_SHARDS}
                               ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""


@register("sample_shuffle_shards", oracle=_SHUF_ORACLE)
def sample_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL shuffle into ordered shards — the
    training-order primitive: every epoch-0 data loader wants the
    corpus in a reproducible pseudo-random order, sharded into files
    that stream independently. ``ORDER BY rand()`` gives a different
    order per run and a single global sort; this derives a Knuth hash
    of (doc_id + seed) — masked to 2^31 before the multiply so the
    product never nears Long overflow (the ``sample_systematic``
    discipline) — then assigns shard = hash % N and an intra-shard
    position by (hash, doc_id). Same seed → same order, on any engine,
    at any partitioning; bump the seed for the next epoch.

    Plan: the hash is map-side; the only shuffle is the window's
    hash-partition on shard. Intra-shard ranking parallelizes across
    N_SHARDS tasks — at 100 TB shard count is sized to target file
    size (thousands), so the ranking window is never the bottleneck,
    and the writer pairs it with
    ``repartition(shard).sortWithinPartitions(pos)`` for one-pass
    sharded output.
    """
    docs = load_table(spark, sf_dir, "documents")
    hv = (
        ((F.col("doc_id") + F.lit(_SHUF_SEED)) % F.lit(2147483648))
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    hashed = docs.select("doc_id", hv.alias("hv"))
    w = Window.partitionBy(F.col("hv") % _SHUF_SHARDS).orderBy("hv", "doc_id")
    return hashed.select(
        "doc_id",
        (F.col("hv") % _SHUF_SHARDS).cast("long").alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


# Poisson(1) CDF breakpoints in 2^32 units (exp(-1)·Σ 1/i!), so the
# resample count is a pure integer-compare on the 32-bit mixed hash —
# identical arithmetic on both engines, no RNG.
_POIS_T0 = 1580030169
_POIS_T1 = 3160060337
_POIS_T2 = 3950075422
_POIS_T3 = 4213413783
_BOOT_REPLICAS = 3

_BOOT_ORACLE = f"""
WITH reps AS (
  SELECT o_orderkey, o_totalprice, r.replica
  FROM orders,
       (SELECT unnest(range({_BOOT_REPLICAS})) AS replica) r
),
weighted AS (
  SELECT replica, o_totalprice,
         CASE
           WHEN u < {_POIS_T0} THEN 0
           WHEN u < {_POIS_T1} THEN 1
           WHEN u < {_POIS_T2} THEN 2
           WHEN u < {_POIS_T3} THEN 3
           ELSE 4
         END AS k
  FROM (
    SELECT replica, o_totalprice,
           ((o_orderkey % 2147483648) * 2654435761
            + (replica + 1) * 40503) % 4294967296 AS u
    FROM reps
  )
)
SELECT CAST(replica AS BIGINT) AS replica,
       CAST(SUM(k) AS BIGINT) AS resampled_rows,
       CAST(SUM(CAST(k * o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
           AS resampled_revenue
FROM weighted
GROUP BY replica
ORDER BY replica
"""


@register("sample_bootstrap_poisson", oracle=_BOOT_ORACLE)
def sample_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap: {_BOOT_REPLICAS} deterministic resample
    replicas of the orders table in ONE pass — the distributed way to
    put confidence intervals on an aggregate. Instead of sampling n
    rows WITH replacement (which needs global coordination), each row
    independently receives a Poisson(1) multiplicity per replica; for
    large n the replica is statistically indistinguishable from a true
    bootstrap resample (Chamandy et al., "Estimating Uncertainty for
    Massively Parallel Algorithms", Google 2012 — public report).

    Determinism: the multiplicity comes from a Knuth-mixed 32-bit
    integer hash of (orderkey, replica) compared against precomputed
    Poisson CDF breakpoints — pure integer arithmetic, identical on
    both engines (same overflow-safe masking as sample_systematic).
    Plan: the replica explode is narrow (array of {_BOOT_REPLICAS}),
    weights fold into the decimal partial sums map-side, and the
    shuffle carries |replicas| rows. One scan regardless of replica
    count.
    """
    orders = load_table(spark, sf_dir, "orders")
    reps = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.sequence(F.lit(0), F.lit(_BOOT_REPLICAS - 1))
        ).alias("replica"),
    )
    u = (
        (F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)
        + (F.col("replica") + 1) * F.lit(40503)
    ) % F.lit(4294967296)
    k = (
        F.when(u < _POIS_T0, 0)
        .when(u < _POIS_T1, 1)
        .when(u < _POIS_T2, 2)
        .when(u < _POIS_T3, 3)
        .otherwise(4)
    )
    return (
        reps.select(
            F.col("replica").cast("long").alias("replica"),
            k.alias("k"),
            "o_totalprice",
        )
        .groupBy("replica")
        .agg(
            F.sum("k").cast("long").alias("resampled_rows"),
            F.sum(
                (F.col("k") * F.col("o_totalprice")).cast(DEC)
            )
            .cast("double")
            .alias("resampled_revenue"),
        )
        .orderBy("replica")
    )


# ---------------------------------------------------------------------------
# Neyman-allocated stratified sampling (variance-proportional)
# ---------------------------------------------------------------------------

# Target sample fraction of the whole table; each stratum's share is
# proportional to N_h * S_h (size x stddev), the allocation that
# minimizes the variance of the estimated mean for a fixed budget —
# high-variance strata are oversampled, near-constant ones barely
# sampled. Membership is a Knuth hash of the row id against the
# stratum's ppm rate, so the SAME rows are in the sample on every run,
# engine, and partitioning (the sample_systematic contract).
_NEYMAN_FRACTION = 0.10

_NEYMAN_ORACLE = f"""
WITH strata AS (
  SELECT event_type,
         COUNT(*) AS n_rows,
         CAST(SUM(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e2 AS s1,
         CAST(SUM(CAST(floor(value * 1e2 + 0.5) AS BIGINT)
                  * CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e4 AS s2
  FROM events GROUP BY 1
),
alloc AS (
  SELECT event_type, n_rows,
         n_rows * sqrt(greatest(s2 / n_rows - (s1 / n_rows) * (s1 / n_rows),
                                0)) AS nh_sh,
         SUM(n_rows) OVER () AS n_total,
         SUM(n_rows * sqrt(greatest(
             s2 / n_rows - (s1 / n_rows) * (s1 / n_rows), 0))) OVER ()
           AS sum_nh_sh
  FROM strata
),
rates AS (
  SELECT event_type, n_rows,
         LEAST(CAST(1000000 AS BIGINT),
               CAST(floor({_NEYMAN_FRACTION} * n_total * (nh_sh / sum_nh_sh)
                          / n_rows * 1e6) AS BIGINT)) AS rate_ppm
  FROM alloc
)
SELECT r.event_type,
       CAST(r.n_rows AS BIGINT) AS n_rows,
       r.rate_ppm,
       CAST(COUNT(CASE WHEN ((e.event_id % 2147483648) * 2654435761)
                            % 4294967296 % 1000000 < r.rate_ppm
                       THEN 1 END) AS BIGINT) AS n_sampled
FROM events e JOIN rates r ON r.event_type = e.event_type
GROUP BY r.event_type, r.n_rows, r.rate_ppm
ORDER BY r.event_type
"""


@register("sample_stratified_neyman", oracle=_NEYMAN_ORACLE)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a fixed 10% budget is
    split across event-type strata proportional to N_h·S_h, the
    allocation that minimizes estimator variance — then membership is
    decided by a Knuth hash of the row id against each stratum's ppm
    rate, so the sample is REPRODUCIBLE across runs, engines, and
    repartitions (`rand()` would redraw it every execution).

    Plan: stratum moments are one groupBy over exact 1e2-unit
    integers; the |strata|-row rate table broadcasts back onto the
    fact scan, so sampling is map-side — one scan + one tiny
    broadcast at any scale. The output audits per-stratum rates and
    realized counts (the sampled rows themselves are the same query
    minus the final aggregate).
    """
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 1e2 + 0.5).cast("long")
    strata = events.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        (F.sum(cents).cast("double") / 1e2).alias("s1"),
        (F.sum(cents * cents).cast("double") / 1e4).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_rows")
    sd = F.sqrt(
        F.greatest(F.col("s2") / F.col("n_rows") - mean * mean, F.lit(0.0))
    )
    w_all = Window.partitionBy()
    alloc = strata.select(
        "event_type",
        "n_rows",
        (F.col("n_rows") * sd).alias("nh_sh"),
        F.sum("n_rows").over(w_all).alias("n_total"),
        F.sum(F.col("n_rows") * sd).over(w_all).alias("sum_nh_sh"),
    )
    rates = alloc.select(
        "event_type",
        "n_rows",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(
                _NEYMAN_FRACTION
                * F.col("n_total")
                * (F.col("nh_sh") / F.col("sum_nh_sh"))
                / F.col("n_rows")
                * 1e6
            ).cast("long"),
        ).alias("rate_ppm"),
    )
    khash = (
        (F.col("event_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) % F.lit(1_000_000)
    return (
        events.join(F.broadcast(rates), "event_type")
        .groupBy("event_type", "n_rows", "rate_ppm")
        .agg(
            F.count(F.when(khash < F.col("rate_ppm"), 1))
            .cast("long")
            .alias("n_sampled")
        )
        .select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            "rate_ppm",
            "n_sampled",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# bottom-k sketch — the mergeable distributed uniform sample
# --------------------------------------------------------------------------

# The k rows with the SMALLEST hash of their id form a uniform sample
# that is MERGEABLE: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
# bottom-k(B)) — the property that makes it the distributed/streaming
# uniform-sampling primitive (every partition forwards at most k
# candidates; the union of sketches is the sketch of the union).
_BOTTOMK = 100

_BOTTOMK_ORACLE = f"""
SELECT CAST(row_number() OVER (ORDER BY hkey, event_id) AS BIGINT)
         AS sample_rank,
       event_id, event_type, hkey
FROM (
  SELECT event_id, event_type,
         CAST(((event_id % 2147483648) * 2654435761) % 4294967296
              AS BIGINT) AS hkey
  FROM events
  ORDER BY hkey, event_id
  LIMIT {_BOTTOMK}
)
ORDER BY sample_rank
"""


@register("sample_bottom_k_sketch", oracle=_BOTTOMK_ORACLE)
def sample_bottom_k_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch: the k rows whose Knuth id-hash is smallest —
    a uniform random sample that is deterministic (reproducible across
    runs, engines, and partitionings) and MERGEABLE (the bottom-k of
    a union is the bottom-k of the per-partition bottom-k's), which
    is what makes it the distributed uniform-sampling primitive:
    unlike reservoir sampling it needs no sequential state, and
    unlike per-row Bernoulli it yields an exact-size sample.

    Scale: ``orderBy().limit(k)`` executes as TakeOrderedAndProject —
    every task forwards at most k rows and the driver merges
    P·k candidates, never a global sort (the plan IS the sketch-merge
    algorithm). The rank window after the cut runs over ≤ k rows.
    """
    events = load_table(spark, sf_dir, "events")
    hkey = (
        ((F.col("event_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ).cast("long")
    sk = (
        events.select("event_id", "event_type", hkey.alias("hkey"))
        .orderBy("hkey", "event_id")
        .limit(_BOTTOMK)
    )
    w = Window.orderBy("hkey", "event_id")
    return sk.select(
        F.row_number().over(w).cast("long").alias("sample_rank"),
        "event_id",
        "event_type",
        "hkey",
    ).orderBy("sample_rank")


# ---------------------------------------------------------------------------
# weighted Poisson (probability-proportional-to-size) sampling (r10)
# ---------------------------------------------------------------------------

_WPOIS_WCAP = 2000  # weight cap (chars) — also the p=BASE_RATE ceiling
_WPOIS_RATE_INV = 5  # BASE_RATE = 1/5 at full weight

_WPOIS_ORACLE = f"""
SELECT doc_id,
       CAST(least(length(text), {_WPOIS_WCAP}) AS BIGINT) AS weight,
       CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
            AS BIGINT) AS hkey
FROM documents
WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296
        * {_WPOIS_WCAP} * {_WPOIS_RATE_INV}
      < least(length(text), {_WPOIS_WCAP}) * 4294967296
ORDER BY doc_id
"""


@register("sample_weighted_poisson", oracle=_WPOIS_ORACLE)
def sample_weighted_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Poisson (probability-proportional-to-size) sampling —
    the quality-weighted corpus downsample a pretraining pipeline runs
    at stage zero: each document kept independently with probability
    p_i = BASE_RATE · w_i / W_CAP, where w_i here is a capped length
    proxy (production swaps in a model quality score column — the
    sampling machinery is identical). Unlike temperature mixture
    sampling (per-GROUP rates) this weights each ROW individually.

    Deterministic and engine-portable with NO floating point: the
    uniform draw is the Knuth id-hash u ∈ [0, 2^32) (the bottom-k
    idiom), and the inclusion test u·W_CAP·RATE_INV < w·2^32 is an
    exact int64 comparison (u·10^4 < 2^46 ≈ 4.3e13, w·2^32 < 2^43 — no
    overflow, no libm, no pow/log whose last-ulp differs across
    engines). Same seed ⇒ same sample on any partitioning, any engine,
    any cluster size — reproducibility a training run can cite.

    Scale: pure map-side filter+project — ZERO exchanges (pinned in
    tests/test_plans.py); composes with any downstream shuffle. The
    kept fraction is Σp_i/N by linearity; per-row independence means
    no coordination, no state, no skew sensitivity.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ).cast("long")
    w = F.least(F.length("text"), F.lit(_WPOIS_WCAP)).cast("long")
    return (
        docs.select("doc_id", w.alias("weight"), u.alias("hkey"))
        .filter(
            F.col("hkey") * _WPOIS_WCAP * _WPOIS_RATE_INV
            < F.col("weight") * F.lit(4294967296)
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# weighted sampling WITHOUT replacement: Efraimidis-Spirakis top-k (r11)
# --------------------------------------------------------------------------

_ESWR_K = 200
_ESWR_WCAP = 2000  # same capped length-proxy weight as the PPS sampler

_ESWR_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(least(length(text), {_ESWR_WCAP}) AS BIGINT) AS weight,
         CAST(floor(
           ln((CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
                    AS DOUBLE) + 1) / 4294967296)
           / least(length(text), {_ESWR_WCAP}) * 1e12 + 0.5
         ) AS BIGINT) AS es_key_p
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY es_key_p DESC, doc_id) AS BIGINT)
         AS sample_rank,
       doc_id, weight, es_key_p
FROM (
  SELECT * FROM keyed ORDER BY es_key_p DESC, doc_id LIMIT {_ESWR_K}
)
ORDER BY sample_rank
"""


@register("sample_weighted_topk", oracle=_ESWR_ORACLE)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the
    Efraimidis-Spirakis A-Res key (2006): each row draws
    u = (hash+1)/2^32 ∈ (0,1] from the Knuth id-hash and keeps key
    ln(u)/w — the top-{_ESWR_K} rows by key are an exact weighted
    sample without replacement (P(i first) = w_i/Σw, recursively).
    Complements the samplers: sample_weighted_poisson gives
    independent per-row inclusion (random sample SIZE);
    sample_bottom_k_sketch gives uniform fixed-size; THIS gives
    weighted fixed-size without replacement — the corpus-curation
    "pick exactly N docs, quality-weighted" primitive.

    Determinism: u derives from the id hash (reproducible anywhere);
    ln on identical doubles is bit-identical cross-engine; the key is
    floor-quantized to 1e-12 BIGINT before ranking so no float tie can
    reorder engines, and doc_id breaks exact key ties.

    Scale: the key is a map-side projection; ``ORDER BY key LIMIT k``
    executes as TakeOrderedAndProject — every task forwards at most k
    rows, the driver merges P·k candidates, no global sort. The
    ES key is MERGEABLE exactly like bottom-k: top-k of a union is the
    top-k of per-partition top-k's, which is what makes the one-pass
    distributed weighted draw possible at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    )
    w = F.least(F.length("text"), F.lit(_ESWR_WCAP)).cast("long")
    key_p = F.floor(
        F.log((h.cast("double") + 1) / F.lit(4294967296.0))
        / w
        * 1e12
        + 0.5
    ).cast("long")
    top = (
        docs.select("doc_id", w.alias("weight"), key_p.alias("es_key_p"))
        .orderBy(F.desc("es_key_p"), F.asc("doc_id"))
        .limit(_ESWR_K)
    )
    wr = Window.orderBy(F.desc("es_key_p"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(wr).cast("long").alias("sample_rank"),
        "doc_id",
        "weight",
        "es_key_p",
    ).orderBy("sample_rank")
