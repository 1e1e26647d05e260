"""Dedup-tier property tests: LSH recall vs exact ground truth,
SimHash banding losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)


def test_minhash_lsh_recall_on_near_dups(spark, sf_dir):
    """MinHash-LSH candidates must cover the high-Jaccard ground-truth
    pairs (16 hashes, 8 bands × 2 rows → ~J² per-band hit rate; for
    J ≥ 0.8 the 8-band miss probability is (1−J²)⁸ < 0.02%)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    if not truth:
        truth = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
    candidates = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()
    }
    assert truth, "fixture should contain near-duplicate documents"
    recall = len(truth & candidates) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall} below 0.9 (missed {truth - candidates})"


def test_simhash_banding_is_lossless(spark, sf_dir):
    """The pigeonhole-banded Hamming-≤3 pairs equal brute force."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    banded = {
        (r.doc_a, r.doc_b) for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    sig = simhash(docs)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .collect()
    }
    assert banded == brute


def test_exact_dedup_total_preserved(spark, sf_dir):
    """Sum of n_copies equals the corpus size (nothing lost)."""
    from bigquery_postgres_events_etl_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    agg = exact_dedup(docs).agg(F.sum("n_copies")).first()[0]
    assert agg == docs.count()


def test_jaccard_hot_shingle_filter_is_candidate_superset_logic(spark, sf_dir):
    """With a generous df cap the filtered run equals exact; with an
    aggressive cap it returns a subset (candidate-generator mode)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    generous = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=10**6).collect()
    }
    assert generous == exact
    aggressive = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=2).collect()
    }
    assert aggressive <= exact


def test_minhash_lsh_xxhash_tier_same_recall_contract(spark, sf_dir):
    """The xxhash64 production tier must satisfy the same recall bound
    as the md5 oracle tier — different digests, same minhash
    statistics (16 hashes, 8 bands × 2 rows)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    } or {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    fast = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, hash_fn="xxhash64").collect()
    }
    assert truth
    recall = len(truth & fast) / len(truth)
    assert recall >= 0.9, f"xxhash64 LSH recall {recall} below 0.9"
