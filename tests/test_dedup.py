"""Property tests for hash-based dedup ops (no SQL oracle possible)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pixels_spark.catalog import load_table
from pixels_spark.functions import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_exact_dedup_keeps_distinct_fingerprints(spark, docs):
    kept = D.exact_dedup(docs, "text")
    n_unique = docs.select(
        F.count_distinct(D.fingerprint(F.col("text")))
    ).first()[0]
    assert kept.count() == n_unique
    # deterministic: keeps the lowest doc_id per group
    assert kept.select(F.min("doc_id")).first()[0] == docs.select(F.min("doc_id")).first()[0]


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    """LSH candidates must contain every truly-near pair at high jaccard
    (with 8 bands × 4 rows, a 0.9-jaccard pair collides w.p. ~1-(1-0.9^4)^8
    ≈ 0.9998 — treat misses as failures at this corpus size)."""
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, threshold=0.9).collect()
    }
    missed = exact - found
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    # verification step guarantees no false positives at the same threshold
    assert found <= exact


def test_minhash_pairs_jaccard_values_match_exact(spark, docs):
    mh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    for pair, j in mh.items():
        assert pair in ex
        assert abs(ex[pair] - j) < 1e-12


def test_simhash_identical_docs_same_signature(spark, docs):
    # duplicate every doc under a shifted id; signatures must agree pairwise
    base = docs.select("doc_id", "text")
    shifted = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    sigs = D.simhash(base.union(shifted), "doc_id", "text")
    a = sigs.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("k"), F.col("simhash").alias("sa")
    )
    b = sigs.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("k"), F.col("simhash").alias("sb")
    )
    diff = a.join(b, "k").filter(F.col("sa") != F.col("sb")).count()
    assert diff == 0


def test_simhash_near_pairs_have_low_hamming(spark, docs):
    pairs = D.simhash_near_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        assert 0 <= r.hamming <= 3


def test_ngram_jaccard_self_similarity(spark, docs):
    """A doc unioned with itself under a new id must appear with jaccard 1."""
    clone = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text").limit(5)
    both = docs.select("doc_id", "text").union(clone)
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(both, threshold=0.999).collect()
    }
    for r in clone.collect():
        orig = r.doc_id - 1_000_000
        assert pairs.get((orig, r.doc_id)) == pytest.approx(1.0)
