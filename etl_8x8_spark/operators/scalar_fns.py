"""Scalar function families (SURVEY.md §2b "Scalar function
families"): one registered query per family, each exercising the
family's core functions over a testdata table.

All narrow-only projections — no shuffle at any scale; every
expression is a Spark built-in inside whole-stage codegen. Oracles
compute the same VALUES (not necessarily via the same functions —
dialects differ; the contract is input/output equality).

Origins (SURVEY.md §2a): string ops generalize R2/R6/R8 (concat /
regex / split in ``src/handlers.py``), map ops R4's header merge
(``api_gateway.py:86-92``), JSON ops R3/R4, conditionals R2/R5/R9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table


@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS INT) AS name_len,
       p_brand || '#' || p_type AS brand_type,
       regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
       split_part(p_name, ' ', 1) AS first_word,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       replace(p_type, ' ', '_') AS type_snake,
       trim('  ' || p_brand || '  ') AS brand_trimmed
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, regex extract,
    split, pad, replace, trim (R2/R6/R8 generalized)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trimmed"
        ),
    )


@register(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(day(o_orderdate) AS INT) AS o_day,
       CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT)
         AS month_start_s,
       CAST(date_diff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate)
            AS INT) AS days_since_epoch_start,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m') AS year_month,
       strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S')
         AS plus_week
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: component extraction, truncation, diffing,
    epoch conversion, formatting, interval arithmetic. Deterministic
    across engines because the session TZ is pinned UTC
    (sources/readers.pin_session_confs)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        # timestamp outputs rendered as epoch longs / formatted strings
        # so the comparison never depends on a comparator's
        # datetime-precision handling
        F.unix_timestamp(F.date_trunc("month", d)).alias("month_start_s"),
        F.datediff(d, F.lit("1992-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.date_format(d + F.expr("INTERVAL 7 DAY"), "yyyy-MM-dd HH:mm:ss").alias(
            "plus_week"
        ),
    )


@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 1000.0) AS abs_delta,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(floor((sqrt(l_quantity)) * 1e6 + 0.5) AS BIGINT) / 1e6 AS qty_sqrt,
       CAST(floor((power(1.0 - l_discount, 2)) * 1e6 + 0.5) AS BIGINT) / 1e6 AS disc_sq,
       CAST(l_linenumber % 3 AS INT) AS line_mod,
       CAST(floor((ln(l_extendedprice + 1.0)) * 1e6 + 0.5) AS BIGINT) / 1e6 AS log_price,
       greatest(l_quantity, 25.0) AS qty_hi,
       least(l_quantity, 25.0) AS qty_lo,
       CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/ceil/floor/sqrt/power/mod/ln/greatest/least/
    sign over the lineitem measures."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.floor((F.sqrt("l_quantity")) * 1e6 + 0.5).cast("long") / F.lit(1e6)).alias("qty_sqrt"),
        (F.floor((F.pow(1.0 - F.col("l_discount"), 2)) * 1e6 + 0.5).cast("long") / F.lit(1e6)).alias("disc_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        (F.floor((F.log(F.col("l_extendedprice") + 1.0)) * 1e6 + 0.5).cast("long") / F.lit(1e6)).alias("log_price"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("price_sign"),
    )


@register(
    "fn_array",
    oracle="""
-- "+ 0.0" after every round(): normalizes IEEE negative zero, which
-- DuckDB's round preserves (-0.0) and Spark's does not (0.0)
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       array_to_string(list_transform(embedding[1:3],
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)), ',')
         AS head3,
       CAST(floor((list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                         (a, b) -> a + b)) * 1e6 + 0.5) AS BIGINT) / 1e6 + 0.0 AS vec_sum,
       CAST(floor((CAST(list_aggregate(embedding, 'max') AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) / 1e6 + 0.0 AS vec_max,
       CAST(floor((CAST(list_aggregate(embedding, 'min') AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) / 1e6 + 0.0 AS vec_min,
       CAST(floor((CAST(list_sort(embedding)[1] AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) / 1e6 + 0.0 AS sorted_first,
       CAST(floor((list_reduce(list_transform(generate_series(1, len(embedding)),
               i -> CAST(embedding[i] AS DOUBLE)
                    * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)),
             (a, b) -> a + b)) * 1e6 + 0.5) AS BIGINT) / 1e6 + 0.0 AS dot_reversed
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size/slice/transform/aggregate/sort/zip_with over
    the embedding vectors (the SURVEY's dot-product family). Left-fold
    sums keep doubles bit-identical across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    dbl = F.transform(e, lambda x: x.cast("double"))
    # "+ 0.0" normalizes IEEE negative zero to match the oracle (see
    # the oracle comment)
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        # head3 as comma-joined fixed-point ints: array-typed and
        # free-form double→string outputs both render differently
        # across engines (numpy vs list, 1.0E-4 vs 0.0001); scaled
        # integers are rendering-proof
        F.concat_ws(
            ",",
            F.transform(
                F.slice(e, 1, 3),
                # round-to-int of float32-grid values: both engines
                # round the same double half-away-from-zero; the
                # float32 grid keeps values far from .5 boundaries.
                lambda x: F.round(x.cast("double") * 10000).cast("long"),
            ),
        ).alias("head3"),
        ((F.floor((F.aggregate(dbl, F.lit(0.0), lambda a, b: a + b)) * 1e6 + 0.5).cast("long") / F.lit(1e6)) + 0.0).alias(
            "vec_sum"
        ),
        ((F.floor((F.array_max(e).cast("double")) * 1e6 + 0.5).cast("long") / F.lit(1e6)) + 0.0).alias("vec_max"),
        ((F.floor((F.array_min(e).cast("double")) * 1e6 + 0.5).cast("long") / F.lit(1e6)) + 0.0).alias("vec_min"),
        ((F.floor((F.element_at(F.array_sort(e), 1).cast("double")) * 1e6 + 0.5).cast("long") / F.lit(1e6)) + 0.0).alias(
            "sorted_first"
        ),
        (
            (F.floor((F.aggregate(
                    F.zip_with(
                        e,
                        F.reverse(e),
                        lambda x, y: x.cast("double") * y.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )) * 1e6 + 0.5).cast("long") / F.lit(1e6))
            + 0.0
        ).alias("dot_reversed"),
    )


@register(
    "fn_map",
    # The oracle computes the same VALUES directly — DuckDB's MAP
    # surface differs (map_extract returns a list), and the contract
    # is output equality, not call-for-call mirroring.
    oracle="""
SELECT n_nationkey,
       n_name AS looked_up,
       'default' AS missing_with_default,
       3 AS n_entries,
       'key,name,region' AS keys_sorted,
       CAST(n_regionkey AS VARCHAR) AS merged_region
FROM nation
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (R4's header-map merge, ``api_gateway.py:86-92``):
    construction, lookup, default on miss, merge where the right side
    wins, key enumeration."""
    nation = load_table(spark, sf_dir, "nation")
    base = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("key"), F.col("n_nationkey").cast("string"),
        F.lit("region"), F.lit("placeholder"),
    )
    extra = F.create_map(F.lit("region"), F.col("n_regionkey").cast("string"))
    # merge with extras winning: drop overlapping keys, then concat
    merged = F.map_concat(
        F.map_filter(base, lambda k, _: ~F.map_contains_key(extra, k)), extra
    )
    return nation.select(
        "n_nationkey",
        F.element_at(base, "name").alias("looked_up"),
        F.coalesce(F.element_at(base, "absent"), F.lit("default")).alias(
            "missing_with_default"
        ),
        F.size(merged).alias("n_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys(merged))).alias("keys_sorted"),
        F.element_at(merged, "region").alias("merged_region"),
    )


@register(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(to_json(struct_pack(
         k := CAST(json_extract_string(props, '$.k') AS INT),
         source := 'events'
       )) AS VARCHAR) AS reserialized,
       json_valid(props) AS is_valid
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (R3/R4): path extraction, typed parse via
    ``from_json``, re-serialization via ``to_json``.

    ``is_valid`` probes ``get_json_object(props, '$')`` — NOT
    ``from_json(...).isNotNull()``, which is True even for malformed
    input (PERMISSIVE mode yields a struct of nulls, never a null
    struct; caught by tests/test_scalar_edges.py). The '$' probe is
    null exactly when the document doesn't parse, matching DuckDB's
    ``json_valid`` on non-null input.
    """
    events = load_table(spark, sf_dir, "events")
    k_int = F.from_json("props", "k INT")["k"]
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(
            F.struct(k_int.alias("k"), F.lit("events").alias("source"))
        ).alias("reserialized"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 1000 THEN 'low'
            ELSE 'high' END AS bal_class,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(suppressed)')
         AS segment_masked,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 5000.0) AS bal_cap,
       CASE WHEN c_nationkey % 2 = 0 THEN c_name END AS name_if_even,
       COALESCE(CASE WHEN c_nationkey % 2 = 0 THEN c_name END, '(odd)')
         AS name_or_marker
FROM customer
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (R2/R5/R9): when-chains, nullif/coalesce
    masking, clamping, null-propagating branches."""
    c = load_table(spark, sf_dir, "customer")
    name_if_even = F.when(F.col("c_nationkey") % 2 == 0, F.col("c_name"))
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.lit("(suppressed)"),
        ).alias("segment_masked"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap"),
        name_if_even.alias("name_if_even"),
        F.coalesce(name_if_even, F.lit("(odd)")).alias("name_or_marker"),
    )


@register(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT p_partkey,
         replace(p_type, ' ', '+') AS tparam,
         p_size
  FROM part
)
SELECT p_partkey,
       'https://shop.example.com/part/' || p_partkey
         || '?type=' || tparam || '&size=' || p_size AS url,
       'shop.example.com' AS host,
       '/part/' || p_partkey AS path,
       'type=' || tparam || '&size=' || p_size AS query,
       tparam AS type_param
FROM u
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-function family: build a canonical product URL from
    ``part`` columns, then parse it back with ``parse_url`` — HOST,
    PATH, QUERY, and keyed query-parameter extraction (R1's
    querystring handling over real URL syntax instead of an event
    map). All codegen'd built-ins; the oracle reconstructs each
    component from first principles rather than parsing.
    """
    part = load_table(spark, sf_dir, "part")
    tparam = F.replace(F.col("p_type"), F.lit(" "), F.lit("+"))
    url = F.concat(
        F.lit("https://shop.example.com/part/"),
        F.col("p_partkey").cast("string"),
        F.lit("?type="),
        tparam,
        F.lit("&size="),
        F.col("p_size").cast("string"),
    )
    df = part.select("p_partkey", url.alias("url"))
    return df.select(
        "p_partkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("type")).alias("type_param"),
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT p_partkey,
       p_partkey & 255 AS low_byte,
       p_partkey | 4096 AS with_flag,
       xor(p_partkey, p_size) AS key_xor_size,
       p_partkey << 2 AS shl2,
       p_partkey >> 3 AS shr3,
       CAST(bit_count(p_partkey) AS INT) AS popcount
FROM part
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family — masks, flags, xor mixing, shifts, and
    population count (the primitives under hash partitioning, bloom
    filters, and bitmap indexes; the engine's own MinHash/SimHash math
    is built from these)."""
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return part.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("p_size").cast("long")).alias("key_xor_size"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_encode_decode",
    oracle="""
SELECT n_nationkey,
       to_base64(CAST(n_name AS BLOB)) AS name_b64,
       CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR)
         AS name_roundtrip,
       lower(hex(CAST(n_name AS BLOB))) AS name_hex,
       md5(n_name) AS name_md5,
       sha256(n_name) AS name_sha256
FROM nation
""",
)
def fn_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/digest scalar family: base64 round-trip, hex, MD5,
    SHA-256 — the boundary codecs (R7's JWT path is base64 + HMAC;
    content addressing is sha2). All codegen'd built-ins; the oracle
    computes identical digests, so the hash check covers the byte-level
    encoding itself."""
    nation = load_table(spark, sf_dir, "nation")
    raw = F.encode("n_name", "utf-8")
    return nation.select(
        "n_nationkey",
        F.base64(raw).alias("name_b64"),
        F.decode(F.unbase64(F.base64(raw)), "utf-8").alias("name_roundtrip"),
        F.lower(F.hex(raw)).alias("name_hex"),
        F.md5(raw).alias("name_md5"),
        F.sha2(raw, 256).alias("name_sha256"),
    )


@register(
    "fn_format",
    oracle="""
SELECT c_custkey,
       printf('%.2f', round(c_acctbal, 2)) AS bal_pretty,
       printf('%08d', c_custkey) AS key_padded,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_lpad,
       rpad(substr(c_name, 1, 8), 12, '.') AS name_cell,
       printf('cust-%d: %s', c_custkey, substr(c_name, 1, 8)) AS label
FROM customer
""",
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-formatting scalar family: fixed-precision rendering,
    zero-padding, fixed-width cells, printf templating —
    the report/export rendering layer (R6's response serialization is
    this family plus JSON).
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        # round@2 on a 2-decimal money column is a provable no-op in
        # both engines (no tie can exist) — exempt from the
        # floor-quantize retrofit.
        F.format_string("%.2f", F.round("c_acctbal", 2)).alias("bal_pretty"),
        F.format_string("%08d", "c_custkey").alias("key_padded"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_lpad"),
        F.rpad(F.substring("c_name", 1, 8), 12, ".").alias("name_cell"),
        F.format_string(
            "cust-%d: %s", "c_custkey", F.substring("c_name", 1, 8)
        ).alias("label"),
    )


_STRUCT_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_totalprice, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC,
                                     o_orderkey DESC) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT o_custkey,
       o_totalprice AS top_price,
       o_orderkey AS top_orderkey,
       CAST(n AS BIGINT) AS n_orders
FROM ranked
WHERE rn = 1
ORDER BY o_custkey
"""


@register("fn_struct", oracle=_STRUCT_ORACLE)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structs as first-class comparable values: ``max(struct(a, b))``
    is the distributed ARGMAX idiom — structs order lexicographically
    by field position, so the max struct carries the winning row's
    payload out of a plain aggregate. One map-side-combined groupBy,
    no window, no self-join: at 100 TB this beats the
    row_number-then-filter rewrite (which must SORT every group) —
    the oracle uses that rewrite precisely because it is the
    semantic ground truth. Field access (``top.p``) and
    ``named_struct`` construction round-trip through the same
    codegen'd path.
    """
    orders = load_table(spark, sf_dir, "orders")
    top = F.max(
        F.struct(
            F.col("o_totalprice").alias("p"),
            F.col("o_orderkey").alias("k"),
        )
    ).alias("top")
    return (
        orders.groupBy("o_custkey")
        .agg(top, F.count("*").cast("long").alias("n_orders"))
        .select(
            "o_custkey",
            F.col("top.p").alias("top_price"),
            F.col("top.k").alias("top_orderkey"),
            "n_orders",
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# VARIANT — Spark 4's open semi-structured type
# ---------------------------------------------------------------------------


@register(
    "fn_variant",
    oracle="""
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
           AS k_missing,
       CASE WHEN json_valid(props) THEN 'OBJECT<k: BIGINT>' END
           AS variant_schema,
       TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
           AS absent_path
FROM events
ORDER BY event_id
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: ``parse_json`` ingests arbitrary
    semi-structured JSON into the open binary VARIANT encoding (no
    schema declared up front, unlike ``from_json``), then
    ``try_variant_get`` does typed path extraction, ``schema_of_
    variant`` reports the inferred shape, and absent paths yield NULL
    instead of erroring — the engine's schema-on-read path for
    payloads whose structure drifts.

    Scale: VARIANT values are a binary columnar encoding with
    shredded-path pushdown in Spark 4 — the 100 TB upgrade from
    string-JSON + repeated get_json_object parses (each of which
    re-parses the full string). All expressions here are JVM
    built-ins; the DuckDB twin works from its native JSON functions.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        events.select(
            "event_id",
            F.try_variant_get(v, "$.k", "long").alias("k_long"),
            F.try_variant_get(v, "$.k", "long").isNull().alias("k_missing"),
            F.schema_of_variant(v).alias("variant_schema"),
            F.try_variant_get(v, "$.missing", "long").alias("absent_path"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Python UDTF — Spark 4's user-defined TABLE function surface
# ---------------------------------------------------------------------------


@register(
    "fn_udtf_installments",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents,
         o_orderkey % 3 + 1 AS n
  FROM orders
),
expanded AS (
  SELECT o_orderkey, n, cents,
         unnest(generate_series(1, CAST(n AS INT))) AS seq
  FROM base
)
SELECT o_orderkey,
       CAST(seq AS INT) AS seq,
       CAST(n AS INT) AS n_inst,
       CAST(CASE WHEN seq = 1 THEN cents - (n - 1) * (cents // n)
                 ELSE cents // n END AS BIGINT) AS amount_cents
FROM expanded
ORDER BY o_orderkey, seq
""",
)
def fn_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (user-defined TABLE function): each order
    row expands to its installment schedule — a VARIABLE number of
    output rows with imperative per-row logic (remainder cents land on
    the first installment), invoked with ``LATERAL`` — the escape
    hatch when row expansion carries logic ``explode`` can't express.

    The arithmetic is all integer cents so the Python rows are
    bit-reproducible and the whole table function hash-verifies
    against a generate_series oracle. Scale: a UDTF is partition-
    parallel Python (the batch-eval node feeds Python workers per
    partition, no shuffle introduced) — fine for row expansion,
    still the wrong tool for scalar math (built-ins stay 10-100×
    faster; see fn_math). ``useArrow=True`` was A/B-measured 10×
    SLOWER here (2.7 s → 28 s at sf0.1): Arrow batch framing per
    yielded row swamps the pickle path for small-row generators —
    measure before reaching for the Arrow knob on UDTFs.
    """
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="seq INT, n_inst INT, amount_cents BIGINT")
    class Installments:
        def eval(self, orderkey: int, totalprice: float):
            if orderkey is None or totalprice is None:
                return  # null inputs expand to zero rows (LATERAL drop)
            cents = int(math.floor(totalprice * 1e2 + 0.5))
            n = orderkey % 3 + 1
            base = cents // n
            for i in range(1, n + 1):
                yield i, n, (cents - (n - 1) * base) if i == 1 else base

    spark.udtf.register("installments", Installments)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_for_udtf"
    )
    # no terminal ORDER BY (LESSONS #51): the gate is order-insensitive
    # and the sort paid a range exchange over the exploded relation.
    return spark.sql(
        """
        SELECT o.o_orderkey, t.seq, t.n_inst, t.amount_cents
        FROM orders_for_udtf o,
             LATERAL installments(o.o_orderkey, o.o_totalprice) t
        """
    )


# ---------------------------------------------------------------------------
# installments, codegen twin — same schedule, zero Python in the row path
# ---------------------------------------------------------------------------


@register(
    "fn_installments_codegen",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents,
         o_orderkey % 3 + 1 AS n
  FROM orders
),
expanded AS (
  SELECT o_orderkey, n, cents,
         unnest(generate_series(1, CAST(n AS INT))) AS seq
  FROM base
)
SELECT o_orderkey,
       CAST(seq AS INT) AS seq,
       CAST(n AS INT) AS n_inst,
       CAST(CASE WHEN seq = 1 THEN cents - (n - 1) * (cents // n)
                 ELSE cents // n END AS BIGINT) AS amount_cents
FROM expanded
ORDER BY o_orderkey, seq
""",
)
def fn_installments_codegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline installment-schedule path: the EXACT same
    variable-row expansion `fn_udtf_installments` demos through a
    Python UDTF, expressed as ``explode(sequence(1, n))`` + integer-
    cent arithmetic — pure whole-stage-codegen, zero Python in the row
    path, same oracle, bit-identical output.

    The pair is deliberate A/B evidence for the "UDFs are the slow
    path" rule: row expansion whose per-row logic is arithmetic
    belongs in built-ins (~7x faster at sf0.1 than the UDTF's
    partition-parallel Python); reach for a UDTF only when the
    expansion logic genuinely can't be expressed as expressions.
    This twin is the bench HEADLINE entry; the UDTF key remains the
    registered Spark-4 UDTF surface demo.

    Scale: explode is pipelined inside the scan stage — no shuffle,
    no Python workers, output rows never materialize outside codegen.
    No terminal orderBy (LESSONS #51): the correctness gate is
    order-insensitive, and the sort cost a range exchange + full sort
    over the exploded (3x) relation for nothing.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 1e2 + 0.5).cast("long")
    n = (F.col("o_orderkey") % 3 + 1).cast("int")
    base = orders.select(
        "o_orderkey",
        cents.alias("cents"),
        n.alias("n_inst"),
    )
    exploded = base.select(
        "o_orderkey",
        "n_inst",
        "cents",
        F.explode(F.sequence(F.lit(1), F.col("n_inst"))).alias("seq"),
    )
    # integer `div`, not floor(double /): exact at any cents magnitude
    rest = F.expr("cents div n_inst").cast("long")
    per = F.col("cents") - (F.col("n_inst") - 1) * rest
    return exploded.select(
        "o_orderkey",
        F.col("seq").cast("int").alias("seq"),
        F.col("n_inst").cast("int").alias("n_inst"),
        F.when(F.col("seq") == 1, per).otherwise(rest).alias("amount_cents"),
    )


@register(
    "fn_net",
    oracle="""
WITH ip AS (
  SELECT event_id,
         (user_id % 223 + 1) AS a,
         (event_id % 256) AS b,
         ((event_id // 256) % 256) AS c,
         (user_id % 256) AS d
  FROM events
)
SELECT event_id,
       a || '.' || b || '.' || c || '.' || d AS ip,
       CAST(a * 16777216 + b * 65536 + c * 256 + d AS BIGINT) AS ip_num,
       (a * 16777216 + b * 65536 + c * 256 + d) >> 20 = 2753 AS in_cidr,
       a || '.' || b || '.' || c || '.0/24' AS subnet24
FROM ip
""",
)
def fn_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network-address scalar family: IPv4 render, dotted-quad →
    uint32, CIDR containment (172.16.0.0/12 via prefix shift — the
    classic is-it-private check), and /24 subnet bucketing — the log
    analytics functions behind geo/abuse rollups. Addresses derive
    deterministically from event/user ids (production parses a real
    ip column — the arithmetic under test is identical).

    All integer/bit built-ins (codegen'd; `shiftright` == DuckDB `>>`
    on BIGINT), zero shuffles — a pure map-side projection, so the op
    composes with any downstream groupBy at scan cost.
    """
    events = load_table(spark, sf_dir, "events")
    a = F.col("user_id") % 223 + 1
    b = F.col("event_id") % 256
    # integer `div`, not float floor-division: doubles lose integer
    # precision above 2^53, and the oracle's `//` is exact at any id
    c = F.expr("event_id div 256") % 256
    d = F.col("user_id") % 256
    ip_num = (a * 16777216 + b * 65536 + c * 256 + d).cast("long")
    return events.select(
        "event_id",
        F.concat_ws(
            ".",
            a.cast("string"),
            b.cast("string"),
            c.cast("string"),
            d.cast("string"),
        ).alias("ip"),
        ip_num.alias("ip_num"),
        (F.shiftright(ip_num, 20) == F.lit(2753)).alias("in_cidr"),
        F.concat(
            a.cast("string"),
            F.lit("."),
            b.cast("string"),
            F.lit("."),
            c.cast("string"),
            F.lit(".0/24"),
        ).alias("subnet24"),
    )


# ---------------------------------------------------------------------------
# geo scalar family: haversine + geohash — r12
# ---------------------------------------------------------------------------

_GEO_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"  # standard geohash base32
# embedded unescaped in single-quoted SQL literals on both engines —
# pin the safe charset (r16 ADVICE item 4)
assert _GEO_ALPHA.isalnum(), "geohash alphabet must stay alphanumeric"
_GEO_BITS = 15  # per-coordinate quantization bits -> 30-bit cell, 6 chars


def _interleave_sql(lon_q: str, lat_q: str) -> str:
    """30-bit geohash cell id: lon bits take the even (high-first)
    positions, lat bits the odd — the geohash bit order. Unrolled
    shift-mask sum, identical text for both engines."""
    terms = []
    for k in range(_GEO_BITS):  # k = 0 is the MOST significant bit
        src_shift = _GEO_BITS - 1 - k
        terms.append(
            f"((({lon_q} >> {src_shift}) & 1) << {2 * (_GEO_BITS - 1 - k) + 1})"
        )
        terms.append(
            f"((({lat_q} >> {src_shift}) & 1) << {2 * (_GEO_BITS - 1 - k)})"
        )
    return "(" + " + ".join(terms) + ")"


def _geohash_chars_sql(cell: str) -> str:
    """Six base32 chars off the 30-bit cell, most significant first."""
    parts = [
        f"substr('{_GEO_ALPHA}', CAST((({cell}) >> {25 - 5 * i}) & 31 "
        f"AS INT) + 1, 1)"
        for i in range(6)
    ]
    return " || ".join(parts)


_GEO_LAT_SQL = "(CAST(user_id % 18000 AS DOUBLE) / 100 - 90)"
_GEO_LON_SQL = "(CAST(event_id % 36000 AS DOUBLE) / 100 - 180)"
_GEO_LATQ_SQL = (
    f"CAST(floor(({_GEO_LAT_SQL} + 90) / 180 * 32768) AS BIGINT)"
)
_GEO_LONQ_SQL = (
    f"CAST(floor(({_GEO_LON_SQL} + 180) / 360 * 32768) AS BIGINT)"
)

_GEO_ORACLE = f"""
WITH g AS (
  SELECT event_id,
         {_GEO_LAT_SQL} AS lat,
         {_GEO_LON_SQL} AS lon,
         LEAST({_GEO_LATQ_SQL}, 32767) AS lat_q,
         LEAST({_GEO_LONQ_SQL}, 32767) AS lon_q
  FROM events
)
SELECT event_id,
       CAST(floor(lat * 1e6 + 0.5) AS BIGINT) AS lat_micro,
       CAST(floor(lon * 1e6 + 0.5) AS BIGINT) AS lon_micro,
       CAST(floor(
         2 * 6371.0 * asin(sqrt(
           sin(radians(lat) / 2) * sin(radians(lat) / 2)
           + cos(radians(lat))
             * sin(radians(lon) / 2) * sin(radians(lon) / 2)
         )) * 1000 + 0.5) AS BIGINT) AS dist_m,
       {_geohash_chars_sql(_interleave_sql("lon_q", "lat_q"))} AS geohash6
FROM g
ORDER BY event_id
"""


@register("fn_geo", oracle=_GEO_ORACLE)
def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo scalar family: haversine great-circle distance (km, to the
    null island origin) and 6-character geohash encoding — the two
    primitives behind geo rollups and join_grid_proximity-style
    spatial bucketing. Coordinates derive deterministically from
    event/user ids (the fn_net idiom — production parses real lat/lon
    columns; the arithmetic under test is identical).

    Determinism: the quantized 15-bit-per-axis cell id and its base32
    render are pure integer shift/mask arithmetic (identical unrolled
    expression text in both engines); the haversine goes through
    sin/cos/asin once in a FIXED operation order and is floor-
    quantized to METERS — at the ~2e7 m output magnitude a last-ULP
    libm difference is ~5e-8 m, five orders under the bucket width,
    where micro-quantization would sit within flip distance (the
    magnitude-aware refinement of the exp/ln precedent). LEAST caps
    the +90/+180 boundary into the top cell.

    Scale: pure map-side projection — zero shuffles, zero UDFs; the
    geohash is 30 codegen'd integer ops per row, which is why
    pipelines geohash-bucket at scan speed before any spatial join.
    """
    events = load_table(spark, sf_dir, "events")
    # r15 (guide §4.4): the ~150 unrolled shift/mask Column ops were
    # ~0.5 s of py4j per build; the IDENTICAL unrolled expression text
    # now ships as one SQL projection (it already existed as text —
    # the DuckDB oracle uses the same unrolled arithmetic).
    lat = "(CAST(user_id % 18000 AS DOUBLE) / 100 - 90)"
    lon = "(CAST(event_id % 36000 AS DOUBLE) / 100 - 180)"
    lat_q = f"least(CAST(floor(({lat} + 90) / 180 * 32768) AS BIGINT), 32767)"
    lon_q = f"least(CAST(floor(({lon} + 180) / 360 * 32768) AS BIGINT), 32767)"
    cell = "CAST(0 AS BIGINT)"
    for k in range(_GEO_BITS):
        src_shift = _GEO_BITS - 1 - k
        cell = (
            f"({cell} + shiftleft(shiftright({lon_q}, {src_shift}) % 2,"
            f" {2 * (_GEO_BITS - 1 - k) + 1}))"
        )
        cell = (
            f"({cell} + shiftleft(shiftright({lat_q}, {src_shift}) % 2,"
            f" {2 * (_GEO_BITS - 1 - k)}))"
        )
    gh = "concat(" + ", ".join(
        f"substring('{_GEO_ALPHA}',"
        f" CAST(shiftright({cell}, {25 - 5 * i}) % 32 AS INT) + 1, 1)"
        for i in range(6)
    ) + ")"
    rlat, rlon = f"radians({lat})", f"radians({lon})"
    hav = (
        f"(2.0D * 6371.0D * asin(sqrt("
        f"sin({rlat} / 2) * sin({rlat} / 2)"
        f" + cos({rlat}) * sin({rlon} / 2) * sin({rlon} / 2))))"
    )
    # no output orderBy: the driver's compare is order-insensitive,
    # and sorting 100k wide rows costs a range exchange + sort the
    # pure-map contract shouldn't pay (the oracle keeps ORDER BY for
    # readable diffs only)
    return events.selectExpr(
        "event_id",
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS lat_micro",
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS lon_micro",
        f"CAST(floor({hav} * 1000 + 0.5) AS BIGINT) AS dist_m",
        f"{gh} AS geohash6",
    )
