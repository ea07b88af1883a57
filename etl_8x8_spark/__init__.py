"""etl_8x8_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query / data-processing
capabilities of the reference ETL service ``msoriadivvy/etl-8x8``
(surveyed in SURVEY.md; record-level dataflow: source -> extract ->
validate -> conditional transform -> serialize -> sink, with error
routing, keyed-lookup enrichment, caching, and boundary schema
validation), generalized into a set-oriented DataFrame operator surface
plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) needed at 100 TB scale.

Layout:
    sources/    — readers (parquet/csv/json, explicit schemas) + sinks
    operators/  — one module per operator family (pure DataFrame fns)
    functions/  — scalar helpers + the single pandas_udf (HMAC for JWT)
    plans/      — pipeline composition, error routing, derived fixtures
    streaming/  — Structured Streaming operators
    registry.py — query-key -> (builder, oracle SQL) registration
"""

__version__ = "0.1.0"
