"""Round-13 tests: the driver-canonicalizer output lint (r12 verdict
item 2) and the embed_jl_project scalar-output fix (item 1).

The driver's correctness harness pandas-``sort_values``/hashes RAW
cells with no list-stringify fallback, so any top-level ARRAY / MAP /
STRUCT output column kills the key with ``TypeError: unhashable
type: 'list'`` (exactly how embed_jl_project went red in r12 while
being mathematically correct). These tests pin the invariant at the
schema level — cheaper and stricter than sampling materialized cells,
because the Spark schema is what *guarantees* the pandas dtype.
"""

from __future__ import annotations

import os

from etl_8x8_spark.registry import all_queries

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# Pandas maps these Spark types to scalar (hashable, sortable) cells;
# everything else (array/map/struct) becomes list/dict objects that
# the driver canonicalizer cannot sort_values over.
_COMPLEX = {"array", "map", "struct"}


class TestDriverCanonLint:
    def test_no_complex_toplevel_columns_anywhere(self, spark, sf_dir):
        """Every registered query's output schema is scalar-only.

        Builds all registry DataFrames at sf0.001 (lazy for the
        declarative ops; the iterative trainers run their small
        fixed-point loops) and asserts no top-level complex type
        survives to the output. This is the standing guard the r12
        verdict asked for: no future key may trip the driver's
        unhashable-cell failure mode again.
        """
        offenders = []
        for name, spec in sorted(all_queries().items()):
            df = spec.builder(spark, sf_dir)
            bad = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if f.dataType.typeName() in _COMPLEX
            ]
            if bad:
                offenders.append(f"{name} -> {bad}")
            spark.catalog.clearCache()
        assert not offenders, (
            "driver canonicalizer cannot hash complex cells; emit "
            "scalars (array_join / to_json / explode) in: "
            + "; ".join(offenders)
        )


class TestPhashPayloadWidth:
    def test_payload_is_exact_width_for_any_text_length(self, spark):
        """The r12 advice item: text||text only reaches the 60-char
        fingerprint width when len(text) >= 30. The repeat-to-width
        payload must be exactly _PHASH_PREFIX chars for 1-char, short,
        boundary, long, empty and NULL texts — and cycle the text (not
        pad with a constant), so the fingerprint still reflects
        payload content."""
        from pyspark.sql import functions as F

        from etl_8x8_spark.operators.multimodal import (
            _PHASH_PREFIX,
            phash_payload,
        )

        rows = [("a",), ("xyz",), ("m" * 29,), ("n" * 30,), ("q" * 200,),
                ("",), (None,)]
        df = spark.createDataFrame(rows, ["text"])
        out = df.select(
            "text", phash_payload(F.col("text")).alias("s")
        ).collect()
        for r in out:
            assert len(r["s"]) == _PHASH_PREFIX, r
        by_text = {r["text"]: r["s"] for r in out}
        assert by_text["xyz"] == ("xyz" * 20)
        assert by_text["a"] == "a" * _PHASH_PREFIX
        assert by_text[""] == " " * _PHASH_PREFIX
        assert by_text[None] == " " * _PHASH_PREFIX
        assert by_text["q" * 200] == "q" * _PHASH_PREFIX


class TestEmbedJlProjectScalar:
    def test_proj_micro_is_string_and_roundtrips(self, spark, sf_dir):
        """The r12 red cell: proj_micro must now be a comma-joined
        STRING of exactly 16 micro-quantized coordinates, and the
        norm-ratio invariant (JL preserves norms around 1.0) must
        still hold on the real fixture."""
        out = all_queries()["embed_jl_project"].builder(spark, sf_dir)
        schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert schema["proj_micro"] == "string"
        assert schema["norm_ratio_micro"] == "bigint"
        rows = out.limit(50).collect()
        assert rows, "fixture embeddings table is non-empty"
        for r in rows:
            coords = r["proj_micro"].split(",")
            assert len(coords) == 16
            for c in coords:
                int(c)  # every coordinate is a clean integer literal
            if r["norm_ratio_micro"] is not None:
                # JL with a ±1 sign matrix keeps ||proj||/||x|| near 1;
                # wide tolerance — this guards plumbing, not the bound.
                assert 0 < r["norm_ratio_micro"] < 3_000_000
