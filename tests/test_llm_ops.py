"""Unit tests for the LLM-data-pipeline operators that have no SQL
oracle (SimHash, LSH ANN) plus plumbing checks for the rest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_210726_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from gmall_flink_210726_spark.operators.multimodal import (
    decode_media,
    media_from_documents,
)
from gmall_flink_210726_spark.operators.similarity import ann_lsh_topk, knn_bruteforce
from gmall_flink_210726_spark.sources.batch import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


class TestDedup:
    def test_exact_dedup_identical_texts(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c"), (3, "A  b C "), (4, "other text")],
            ["doc_id", "text"],
        )
        out = {r.keep_id: r.dup_count for r in exact_dedup(df).collect()}
        # normalization folds case/whitespace: 1,2,3 are one group
        assert out == {1: 3, 4: 1}

    def test_simhash_identical_and_different(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog again and again"),
                (2, "the quick brown fox jumps over the lazy dog again and again"),
                (3, "completely unrelated words nothing shared here at all today friends"),
            ],
            ["doc_id", "text"],
        )
        sigs = {r.id: r.simhash for r in simhash64(df).collect()}
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]
        pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(df).collect()}
        assert pairs == {(1, 2): 0}

    def test_simhash_near_pairs_overlap_jaccard(self, docs):
        """SimHash (hamming ≤ 3) should find mostly the same near-dups
        as exact 3-gram Jaccard on the fixture's bimodal data."""
        sim = {(r.id_a, r.id_b) for r in simhash_near_pairs(docs).collect()}
        exact = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert len(exact) > 0
        # token-multiset vs sequence signals differ; require strong overlap
        assert len(sim & exact) >= 0.7 * len(exact)

    def test_minhash_recall_on_fixture(self, docs):
        exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
        lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, k=64, bands=16, threshold=0.5).collect()}
        assert lsh == exact  # exact-verified candidates, full recall here

    def test_max_df_skew_cap(self, docs):
        capped = ngram_jaccard_pairs(docs, threshold=0.5, max_df=2)
        # dropping hot shingles must never create pairs from nothing
        uncapped = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
        for r in capped.collect():
            assert (r.id_a, r.id_b) in uncapped


class TestSimilarity:
    def test_knn_self_excluded_and_k(self, emb):
        out = knn_bruteforce(emb, query_ids=[0, 1, 2], k=5).collect()
        assert len(out) == 15
        assert all(r.neighbor_id != r.query_id for r in out)
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
        for q, rows in by_q.items():
            rows.sort()
            coss = [c for _, c in rows]
            assert coss == sorted(coss, reverse=True)

    def test_blocked_knn_equals_jvm_fold(self, emb):
        from gmall_flink_210726_spark.operators.similarity import knn_bruteforce_blocked

        qids = list(range(10))
        a = {(r.query_id, r.rank): (r.neighbor_id, r.cos) for r in knn_bruteforce(emb, qids, 5).collect()}
        b = {(r.query_id, r.rank): (r.neighbor_id, r.cos) for r in knn_bruteforce_blocked(emb, qids, 5).collect()}
        assert a == b

    def test_lsh_ann_recall(self, emb):
        """Multi-table bucketed ANN: top-1 recall vs brute force ≥ 60%
        with 16 tables × 4 planes (documented tradeoff, not exactness)."""
        qids = list(range(20))
        bf = {r.query_id: r.neighbor_id for r in knn_bruteforce(emb, qids, k=1).collect()}
        ann = {r.query_id: r.neighbor_id for r in ann_lsh_topk(emb, qids, k=1).collect()}
        hits = sum(1 for q, n in ann.items() if bf.get(q) == n)
        assert len(ann) == len(qids)
        assert hits / len(ann) >= 0.6


class TestMultimodal:
    def test_decode_plumbing(self, spark, docs):
        media = media_from_documents(docs)
        decoded = decode_media(media).cache()
        assert decoded.count() == docs.count()
        joined = decoded.join(
            docs.select(F.col("doc_id").alias("media_id"), F.length("text").alias("n")),
            "media_id",
        )
        assert joined.filter(F.col("n_bytes") != F.col("n")).count() == 0
        assert decoded.filter(F.col("header") <= 0).count() == 0

    def test_real_codec_is_stubbed(self):
        from gmall_flink_210726_spark.operators.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG....")
