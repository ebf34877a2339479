"""Recall/consistency checks for the hash-based near-dup operators
(no DuckDB oracle possible — xxhash64 is engine-specific)."""

from __future__ import annotations

from ecommerce_lakehouse_platform_spark.operators import neardup
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in neardup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in neardup.minhash_lsh_pairs(
            docs, num_perm=64, bands=32, threshold=0.5
        ).collect()
    }
    assert exact, "fixture should contain planted near-dup pairs"
    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(lsh)}/{len(exact)})"


def test_simhash_finds_planted_dups(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in neardup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in neardup.simhash_pairs(docs, max_hamming=12, bands=4).collect()
    }
    assert exact
    overlap = len(sim & exact) / len(exact)
    assert overlap >= 0.5, f"simhash should catch most strong near-dups: {overlap}"


def test_embedding_neardup_symmetric_bound(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    pairs = neardup.embedding_neardup_pairs(emb, threshold=0.4).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(0.4 <= r.cosine_sim <= 1.0 for r in pairs)
