"""Tests for the LLM-pipeline families: recall of the approximate
paths (MinHash LSH, SimHash, hyperplane LSH) against their exact
counterparts, plus the multimodal decode-stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


class TestDedupRecall:
    def test_minhash_recall_vs_exact(self, spark, sf_dir, queries):
        exact = _pairs(queries["dedup_ngram_jaccard"].builder(spark, sf_dir))
        lsh = _pairs(queries["dedup_minhash_near"].builder(spark, sf_dir))
        assert exact, "planted near-dups must exist"
        recall = len(exact & lsh) / len(exact)
        assert recall >= 0.8, f"MinHash LSH recall {recall:.2f} < 0.8"

    def test_minhash_verified_precision(self, spark, sf_dir, queries):
        # every reported pair carries its exact jaccard >= threshold
        rows = queries["dedup_minhash_near"].builder(spark, sf_dir).collect()
        assert all(r.jaccard >= 0.7 for r in rows)

    def test_simhash_finds_planted_pairs(self, spark, sf_dir, queries):
        from etl_8x8_spark.operators.dedup import _NEAR_OFFSET

        rows = queries["dedup_simhash"].builder(spark, sf_dir).collect()
        planted_found = {
            (r.doc_a, r.doc_b)
            for r in rows
            if r.doc_b - r.doc_a == _NEAR_OFFSET
        }
        exact = _pairs(queries["dedup_ngram_jaccard"].builder(spark, sf_dir))
        # recall over the PLANTED subset: the exact pair set also holds
        # organic prefix-blocked near-dups the planted_found numerator
        # excludes by construction
        exact_planted = {
            p for p in exact if p[1] - p[0] == _NEAR_OFFSET
        }
        assert exact_planted
        recall = len(planted_found & exact_planted) / len(exact_planted)
        assert recall >= 0.6, f"SimHash recall {recall:.2f} < 0.6"
        assert all(r.hamming <= 6 for r in rows)

    def test_exact_dedup_groups(self, spark, sf_dir, queries):
        rows = queries["dedup_exact"].builder(spark, sf_dir).collect()
        sizes = sorted({r.n_copies for r in rows})
        assert sizes == [1, 2], "seeded corpus has singletons and exact pairs"
        for r in rows:
            if r.n_copies == 2:
                # keeper is always the original, not the planted variant
                assert r.keeper_doc_id < 1_000_000


class TestSimSearch:
    def test_lsh_recall_vs_exact(self, spark, sf_dir, queries):
        exact = queries["sim_search_topk"].builder(spark, sf_dir)
        lsh = queries["sim_search_lsh_topk"].builder(spark, sf_dir)
        exact_top = {
            (r.q_id, r.vec_id) for r in exact.filter(F.col("rank") <= 5).collect()
        }
        lsh_all = {(r.q_id, r.vec_id) for r in lsh.collect()}
        assert exact_top
        recall = len(exact_top & lsh_all) / len(exact_top)
        # hyperplane LSH over *random* 64-d vectors is a weak signal;
        # the planted-duplicate dedup case is the high-recall path.
        # This bound catches sign/bucket bugs, not quality regressions.
        assert recall >= 0.15, f"LSH top-5 recall {recall:.2f}"

    def test_ivf_recall_vs_exact(self, spark, sf_dir, queries):
        exact = queries["sim_search_topk"].builder(spark, sf_dir)
        ivf = queries["sim_search_ivf_topk"].builder(spark, sf_dir)
        exact_top = {
            (r.q_id, r.vec_id) for r in exact.filter(F.col("rank") <= 5).collect()
        }
        ivf_all = {(r.q_id, r.vec_id) for r in ivf.collect()}
        recall = len(exact_top & ivf_all) / len(exact_top)
        # nprobe/K = 2/16 of the corpus scored; random-vector corpora
        # are the worst case for any ANN — bound catches wiring bugs
        assert recall >= 0.15, f"IVF top-5 recall {recall:.2f}"

    def test_exact_topk_shape(self, spark, sf_dir, queries):
        rows = queries["sim_search_topk"].builder(spark, sf_dir).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.q_id, []).append(r)
            assert r.q_id != r.vec_id, "self-match must be excluded"
            assert -1.000001 <= r.sim <= 1.000001
        for q, rs in by_q.items():
            assert len(rs) == 10
            sims = [r.sim for r in sorted(rs, key=lambda r: r.rank)]
            assert sims == sorted(sims, reverse=True)


class TestMultimodalDecode:
    def test_stub_contract(self, spark, sf_dir, queries):
        rows = queries["multimodal_decode"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows[:100]:
            assert 1 <= r.n_bytes <= 32
            assert 16 <= r.fake_width < 80
            assert 16 <= r.fake_height < 80
            assert 0 <= r.checksum < 1_000_000_007

    def test_decoder_batch_is_swappable(self):
        """The mapInPandas worker takes (doc_id, payload) batches and
        emits the declared schema — the contract a real codec drops
        into."""
        import pandas as pd

        from etl_8x8_spark.operators.multimodal import decode_media_batch

        batch = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"xyz!"]})
        out = list(decode_media_batch(iter([batch])))
        assert len(out) == 1
        assert list(out[0].columns) == [
            "doc_id",
            "n_bytes",
            "fake_width",
            "fake_height",
            "checksum",
        ]
        assert out[0].n_bytes.tolist() == [3, 4]


class TestMultimodalToolkit:
    def test_resize_contract(self):
        import pandas as pd

        from etl_8x8_spark.operators.multimodal import resize_media_batch

        batch = pd.DataFrame(
            {"doc_id": [1, 2], "payload": [b"x" * 40, b"short"]}
        )
        out = list(resize_media_batch(iter([batch])))[0]
        assert all(len(p) == 16 for p in out.payload)
        assert out.doc_id.tolist() == [1, 2]

    def test_frames_stride_and_offsets(self, spark, sf_dir, queries):
        rows = queries["multimodal_frames"].builder(spark, sf_dir).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
            assert r.byte_offset == r.frame_idx * 8
        for doc, frames in list(by_doc.items())[:50]:
            idxs = sorted(f.frame_idx for f in frames)
            assert idxs[0] == 0
            assert all(i % 2 == 0 for i in idxs)  # stride-2 sampling

    def test_features_fixed_dim_and_mass(self, spark, sf_dir, queries):
        rows = queries["multimodal_features"].builder(spark, sf_dir).collect()
        for r in rows[:100]:
            hist = [int(x) for x in r.features.split(",")]
            assert len(hist) == 8
            assert 1 <= sum(hist) <= 32  # one count per payload byte
