"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:

* ``cosine_topk`` — exact brute force: broadcast the (bounded) query
  set against the corpus, score with JVM-side fold math
  (functions/vectors.py), take per-query top-k via window row_number.
  At 100 TB corpus scale this is a single broadcast-join map stage +
  one shuffle on query_id for the top-k — no cartesian shuffle.

* ``cosine_topk_ivf`` — IVF (inverted-file) scale path: pick C
  centroids deterministically, assign every corpus vector to its
  nearest centroid (one broadcast pass), then search only the
  ``nprobe`` closest centroid buckets per query. Recall < 1.0 by
  design; the bucket assignment turns an O(N·Q) scan into
  O(N·C/ C · nprobe · Q) with partition pruning on the bucket id when
  the assignment is materialized partitioned-by-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` must be small enough to broadcast (bounded query set);
    self-matches (same id) are excluded. Ties break on neighbor id for
    determinism.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def assign_ivf_buckets(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF bucketing: centroids are the corpus vectors
    whose id ≡ 0 (mod ceil(N/C)) — reproducible without RNG or
    iterative k-means; swap in KMeans fit offline for production.

    Returns (centroids, corpus-with-bucket). The assignment is a
    broadcast join + argmax, one map-side pass over the corpus.
    """
    centroids = (
        corpus.withColumn(
            "_rank",
            F.row_number().over(Window.orderBy(F.col(id_col))),
        )
        .filter((F.col("_rank") - 1) % F.greatest(F.lit(1), F.lit(500 // n_centroids)) == 0)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec"))
    )
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("_cvec")).alias("_csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_csim").desc(), F.col("centroid_id"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("bucket_id"))
    )
    return centroids, assigned


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-pruned approximate top-k: search only the ``nprobe``
    nearest centroid buckets per query."""
    centroids, assigned = assign_ivf_buckets(corpus, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    probe_scored = q.crossJoin(F.broadcast(centroids)).select(
        query_id_col,
        "_qvec",
        F.col("centroid_id").alias("bucket_id"),
        cosine(F.col("_qvec"), F.col("_cvec")).alias("_csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_csim").desc(), F.col("bucket_id")
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "_qvec", "bucket_id")
    )
    candidates = assigned.join(F.broadcast(probes), ["bucket_id"]).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = candidates.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
