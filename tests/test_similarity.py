"""IVF approximate search: recall against the exact brute-force path."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators import similarity
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_ivf_recall_at_5(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=16, nprobe=4
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # nprobe=4/16 buckets on random vectors: recall well above random
    assert recall >= 0.3, f"IVF recall@5 unexpectedly low: {recall}"
    # every approx hit must carry the same score as the exact path
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert r.cosine_sim == exact_scores[(r.query_id, r.neighbor_id)]


def test_ivf_with_trained_kmeans_centroids(spark):
    """operators/kmeans.kmeans_centroids plugs into the IVF path as
    the trained coarse quantizer: same plumbing, centroids frame
    swapped in, recall in the hash-pick band and every returned score
    exact."""
    from ecommerce_lakehouse_platform_spark.operators.kmeans import (
        kmeans_centroids,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = kmeans_centroids(emb, k=16, n_iters=2, salt="ivfkm:")
    assert cents.count() == 16  # reseeding keeps all k alive
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.cosine_topk_ivf(
        emb, queries, k=5, nprobe=4, centroids=cents
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"trained-IVF recall@5 unexpectedly low: {recall}"
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert r.cosine_sim == exact_scores[(r.query_id, r.neighbor_id)]
    # the trained quantizer is the REGISTERED default
    # (ext_similarity_ivf): its recall must be no worse than the
    # untrained salted-hash pick it replaced
    hash_approx = similarity.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=16, nprobe=4
    ).collect()
    hash_set = {(r.query_id, r.neighbor_id) for r in hash_approx}
    hash_recall = len(exact_set & hash_set) / len(exact_set)
    assert recall >= hash_recall, (
        f"trained-IVF recall {recall} fell below the hash pick's "
        f"{hash_recall}"
    )


def test_rhlsh_recall_and_pruning(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.cosine_topk_rhlsh(
        emb, queries, k=5, n_bits=32, bands=8
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 bands × 4 sign bits: true near neighbors collide in ≥1 band
    # with high probability while random pairs mostly do not
    assert recall >= 0.3, f"RH-LSH recall@5 unexpectedly low: {recall}"
    # scores on shared hits are the exact scores (verify stage is exact)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert r.cosine_sim == exact_scores[(r.query_id, r.neighbor_id)]
    # determinism: seeded hyperplanes → identical output across runs
    again = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_rhlsh(
            emb, queries, k=5, n_bits=32, bands=8
        ).collect()
    }
    assert approx_set == again


def test_exact_topk_shape(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = similarity.cosine_topk(emb, queries, k=5).collect()
    assert len(out) == 50  # 10 queries × 5 neighbors
    per_query = {}
    for r in out:
        per_query.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
    assert all(len(v) == 5 for v in per_query.values())
