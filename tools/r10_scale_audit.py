"""Linearity audits for the r9-new dedup/ANN family at N× scale
(r9 verdict item 5): alongside `scale_experiment.py --copies 100`'s
wall-clock ratios, count the INTERMEDIATE volumes that would betray a
super-linear plan — the way the r9 minhash audit counted candidate
pairs. Wall-clock on fixed cores saturates; these counts cannot.

- substring span/scrub: positional-shingle rows (must be linear in
  corpus tokens), duplicated shingles (nd >= 2) and mark rows (linear
  when the duplicate RATE is constant — the replica tags words per
  copy so cross-copy docs share no shingles).
- incremental minhash: batch x index candidate pairs after the band
  bucket join (linear: both sides grow N× but buckets stay disjoint
  across copies), and the max index-side band bucket (must stay
  ~constant — a growing hot bucket is the quadratic smell).

Usage: python tools/r10_scale_audit.py [--copies 100]
Prints one JSON line per metric set: {"dataset": ..., metrics...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"


def span_metrics(spark, sf_dir: str) -> dict:
    from etl_8x8_spark.operators.dedup import (
        _SPAN_K,
        _seeded_span_corpus,
        positional_shingles,
        tokens,
    )
    from etl_8x8_spark.sources.readers import load_table

    corpus = _seeded_span_corpus(load_table(spark, sf_dir, "documents"))
    long_docs = corpus.select("doc_id", tokens().alias("tk")).filter(
        F.size("tk") >= _SPAN_K
    )
    sh = long_docs.select(
        "doc_id",
        F.posexplode(positional_shingles(F.col("tk"), _SPAN_K)).alias(
            "pos0", "s"
        ),
    ).persist()
    n_shingles = sh.count()
    per_sh = (
        sh.select("s", "doc_id")
        .distinct()
        .groupBy("s")
        .agg(F.count("*").alias("nd"))
        .persist()
    )
    dup = per_sh.filter(F.col("nd") >= 2)
    n_dup = dup.count()
    max_nd = (per_sh.agg(F.max("nd")).first() or [0])[0]
    n_marks = sh.join(dup.select("s"), "s").count()
    sh.unpersist()
    per_sh.unpersist()
    return {
        "shingle_rows": n_shingles,
        "dup_shingles": n_dup,
        "mark_rows": n_marks,
        "max_docs_per_shingle": max_nd,
    }


def inc_minhash_metrics(spark, sf_dir: str) -> dict:
    from etl_8x8_spark.operators.dedup import (
        _inc_batch,
        band_hashes,
        minhash_signature,
        shingle_hashes,
        token_hashes,
        tokens,
    )
    from etl_8x8_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")

    def buckets(corpus):
        return corpus.select(
            "doc_id",
            F.posexplode(
                band_hashes(
                    minhash_signature(shingle_hashes(token_hashes(tokens())))
                )
            ).alias("band_idx", "band_hash"),
        )

    ib = buckets(docs.select("doc_id", "text")).persist()
    bb = buckets(_inc_batch(docs))
    max_bucket = (
        ib.groupBy("band_idx", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    pairs = (
        bb.alias("b")
        .join(
            ib.alias("i"),
            (F.col("b.band_idx") == F.col("i.band_idx"))
            & (F.col("b.band_hash") == F.col("i.band_hash")),
        )
        .select(F.col("b.doc_id"), F.col("i.doc_id"))
        .dropDuplicates()
        .count()
    )
    ib.unpersist()
    return {"candidate_pairs": pairs, "max_index_bucket": max_bucket}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    from etl_8x8_spark.session import get_spark
    from tools.scale_experiment import build_replica

    spark = get_spark(
        "r10_scale_audit",
        cpus="32",
        shuffle_partitions=min(max(32, 8 * args.copies), 256),
    )
    replica = build_replica(spark, args.copies)
    for tag, d in (("base", BASE_SF), (f"{args.copies}x", replica)):
        print(
            json.dumps({"dataset": tag, "span": span_metrics(spark, d)}),
            flush=True,
        )
        print(
            json.dumps(
                {"dataset": tag, "inc_minhash": inc_minhash_metrics(spark, d)}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
