"""Multimodal column handling (BASELINE north star: image/audio/video
as opaque binary columns with typed metadata).

Two registered queries:

- ``multimodal_struct`` — documents ⋈ embeddings into one typed nested
  column (text + vector modalities side by side; oracle-checked)
- ``multimodal_decode`` — binary payload -> metadata extraction through
  a ``mapInPandas`` batch UDF, the plumbing a real image/audio decoder
  plugs into (oracle-checked because the stub decode is deterministic
  arithmetic both engines can compute)

The actual media codecs aren't in this container, so
:func:`decode_media_batch` is the REAL Spark-side plumbing (Arrow
batches in, typed struct out, partition-parallel) around a clearly
marked stub decode; swap `_decode_payload` for a PIL/ffmpeg call and
nothing else changes. See tests/test_llm_ops.py for the stub contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_8x8_spark.registry import register
from etl_8x8_spark.sources.readers import load_table


@register(
    "multimodal_struct",
    oracle="""
SELECT d.doc_id,
       CAST(to_json(struct_pack(
         lang := d.lang,
         source := d.source,
         n_chars := d.n_chars,
         dim := len(e.embedding)
       )) AS VARCHAR) AS modality_meta,
       round(CAST(e.embedding[1] AS DOUBLE), 6) + 0.0 AS first_component,
       e.label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents joined to their embedding as one typed nested column:
    the pattern for carrying (text, vector, image, ...) modalities in a
    single row. The struct is serialized to JSON for cross-engine
    hashing; inside the engine it stays a StructType (columnar, prunable
    — a reader selecting ``modality.lang`` scans one leaf column).

    Scale: doc_id = vec_id is a 1:1 equi join; at 100 TB bucket both
    tables on the id so the join is shuffle-free (see BASELINE.md
    bucketing note).
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "inner")
    meta = F.struct(
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("n_chars").alias("n_chars"),
        F.size("embedding").alias("dim"),
    )
    return joined.select(
        "doc_id",
        F.to_json(meta).alias("modality_meta"),
        # + 0.0 normalizes IEEE -0.0 (DuckDB round preserves the sign)
        (F.round(F.element_at("embedding", 1).cast("double"), 6) + 0.0).alias(
            "first_component"
        ),
        "label",
    )


# ---------------------------------------------------------------------------
# binary decode plumbing (mapInPandas)
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake in place of a real codec.

    A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in container
        return img.width, img.height, ...

    The fake derives (width, height, checksum) from the bytes so the
    pipeline stays testable and oracle-checkable.
    """
    width = 16 + payload[0] % 64 if payload else 0
    height = 16 + payload[-1] % 64 if payload else 0
    checksum = sum(payload) % 1_000_000_007
    return width, height, checksum


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow record batches of (doc_id, payload)
    in, typed metadata out. Partition-parallel, batch-vectorized
    transfer; only the decode itself is per-item Python (as any real
    codec call would be)."""
    for pdf in batches:
        decoded = [_decode_payload(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "fake_width": [d[0] for d in decoded],
                "fake_height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
            }
        )


@register(
    "multimodal_decode",
    oracle="""
WITH p AS (
  -- documents text is pure ASCII at every sf, so chars == bytes
  SELECT doc_id, substr(text, 1, 32) AS prefix FROM documents
)
SELECT doc_id,
       CAST(length(prefix) AS INT) AS n_bytes,
       CAST(16 + ascii(substr(prefix, 1, 1)) % 64 AS INT) AS fake_width,
       CAST(16 + ascii(substr(prefix, -1, 1)) % 64 AS INT) AS fake_height,
       CAST(list_sum(list_transform(generate_series(1, length(prefix)),
            i -> ascii(substr(prefix, i, 1)))) % 1000000007 AS BIGINT)
         AS checksum
FROM p
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary -> typed metadata via ``mapInPandas``: the binary
    column is synthesized from the document text (the testdata has no
    real media), the decode is the stub above, and the Spark-side
    plumbing — binary column, Arrow batching, explicit output schema,
    partition parallelism — is exactly what a real image/audio decode
    pass uses at 100 TB (decode cost scales per-partition, no shuffle).
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.substring("text", 1, 32), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(decode_media_batch, _DECODE_SCHEMA)
