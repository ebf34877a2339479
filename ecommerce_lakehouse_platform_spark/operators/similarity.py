"""Approximate-nearest-neighbor search over an embedding column.

Three strategies:

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

* ``cosine_topk_rhlsh`` — random-hyperplane (sign) LSH: each vector
  maps to ``n_bits`` sign bits (P[bit match] = 1 − θ/π), grouped into
  bands; query and corpus meet via an equi-join on (band, bucket) —
  no centroid pass, no cross join anywhere, and the bucket join keys
  are data-independent so new corpus partitions bucket purely
  map-side. The scale profile differs from IVF: IVF needs a centroid
  model (and re-clustering as data drifts), RH-LSH is stateless and
  append-friendly, at the cost of needing more bits for the same
  recall.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


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


def _rh_band_buckets(
    df: DataFrame,
    id_alias: str,
    id_col: str,
    vec_col: str,
    hyperplanes: list[list[float]],
    bands: int,
) -> DataFrame:
    """(id, vec, band, bucket) rows: sign bit per hyperplane (JVM-side
    dot-product fold), bits packed per band into an int bucket key."""
    n_bits = len(hyperplanes)
    band_bits = n_bits // bands
    bit_cols: list[Column] = [
        F.when(
            dot(F.col("_vec"), F.array(*[F.lit(v) for v in h])) >= 0, 1
        ).otherwise(0)
        for h in hyperplanes
    ]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            sum(
                (bit_cols[b * band_bits + j] * (1 << j))
                for j in range(band_bits)
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return (
        df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("_vec"))
        .select(id_alias, "_vec", F.explode(F.array(*band_structs)).alias("_bb"))
        .select(
            id_alias,
            "_vec",
            F.col("_bb.band").alias("band"),
            F.col("_bb.bucket").alias("bucket"),
        )
    )


def cosine_topk_rhlsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 32,
    bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Random-hyperplane LSH approximate top-k: candidates are corpus
    vectors sharing at least one (band, bucket) with the query, then
    exact cosine + per-query top-k on candidates only.

    Hyperplanes are seeded-deterministic (reproducible runs); with
    8 bands × 4 bits, a neighbor at cosine 0.5 is recalled with
    p ≈ 1 − (1 − (1 − θ/π)⁴)⁸ ≈ 0.83 — tune ``n_bits``/``bands`` up
    for higher recall at scale.
    """
    rnd = random.Random(0xC05EED)
    hyperplanes = [
        [rnd.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]
    cb = _rh_band_buckets(corpus, "neighbor_id", id_col, vec_col, hyperplanes, bands)
    qb = _rh_band_buckets(queries, query_id_col, id_col, vec_col, hyperplanes, bands)
    candidates = (
        qb.withColumnRenamed("_vec", "_qvec")
        .join(cb.withColumnRenamed("_vec", "_cvec"), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = candidates.select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hard_triplets(
    corpus: DataFrame,
    queries: DataFrame,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Contrastive-training triplet mining: per query, the hardest
    POSITIVE (most-similar same-label vector) and the ``k_neg``
    hardest NEGATIVES (most-similar different-label vectors).

    The standard ANN-assisted construction of contrastive batches
    (hard negatives carry most of the gradient signal). Same scale
    shape as :func:`cosine_topk`: broadcast the bounded query batch,
    score map-side, one shuffle on query_id for the per-role top-k;
    ties break on neighbor id. Swap the scored join for the IVF/LSH
    candidate paths when the query batch stops being broadcastable.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.col(label_col).alias("_qlabel"),
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        "_qlabel",
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    pos = (
        scored.filter(F.col("neighbor_label") == F.col("_qlabel"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .withColumn("role", F.lit("pos"))
    )
    neg = (
        scored.filter(F.col("neighbor_label") != F.col("_qlabel"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neg)
        .withColumn("role", F.lit("neg"))
    )
    return pos.unionByName(neg).select(
        query_id_col, "role", "rank", "neighbor_id", "neighbor_label", "cosine_sim"
    )


def assign_ivf_buckets(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF bucketing: centroids are the ``n_centroids``
    corpus vectors with the smallest salted ``md5(id)`` — a uniform
    pseudo-sample of the whole corpus, reproducible without RNG or
    iterative k-means (and reproducible *cross-engine*: the DuckDB
    oracles mirror the same pick); swap in KMeans fit offline for
    production. The pick executes as TakeOrderedAndProject (per-
    partition partial top-n, driver merge of C rows) — fully parallel,
    no global sort, no single-partition exchange, and it samples the
    entire corpus rather than an id prefix.

    Returns (centroids, corpus-with-bucket). The assignment is a
    broadcast join + argmax, one map-side pass over the corpus.

    Pass ``centroids`` — a small ``(centroid_id, _cvec)`` frame, e.g.
    ``operators.kmeans.kmeans_centroids`` — to use TRAINED centroids
    instead of the hash pick; ``n_centroids`` is then ignored.
    """
    if centroids is None:
        centroids = (
            corpus.select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("_cvec"),
                F.md5(
                    F.concat(F.lit("ivf:"), F.col(id_col).cast("string"))
                ).alias("_h"),
            )
            .orderBy("_h", "centroid_id")
            .limit(n_centroids)
            .drop("_h")
        )
    # spread a provably-tiny corpus before the C-way scoring fan-out
    # (operators/spread.py): the cross join multiplies per-row work by
    # C cosines, and a single-row-group source would serialize it all
    # onto one core. Large corpora pass through with native scan
    # parallelism.
    from .spread import spread_small

    corpus = spread_small(corpus, id_col)
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("_cvec")).alias("_csim"),
    )
    # argmax as a MAP-COMBINED aggregate, not a window (r13): the
    # row_number window shuffled and sorted all n×C scored rows; the
    # struct-max aggregate partially reduces each vector's C
    # candidates map-side, so only n best-so-far rows cross the wire
    # and the sort disappears. Struct comparison is lexicographic and
    # ``-centroid_id`` is unique within a vector's group, so the max
    # is exactly (csim DESC, centroid_id ASC) — the same argmax (and
    # NaN ordering) as the window and the DuckDB oracle's row_number.
    best = F.max(
        F.struct(
            F.col("_csim").alias("_s"),
            (-F.col("centroid_id")).alias("_nc"),
            F.col("centroid_id").alias("_c"),
            F.col(vec_col).alias("_v"),
        )
    ).alias("_best")
    assigned = (
        scored.groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            F.col("_best._v").alias(vec_col),
            F.col("_best._c").alias("bucket_id"),
        )
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
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned approximate top-k: search only the ``nprobe``
    nearest centroid buckets per query. ``centroids`` overrides the
    hash-sampled pick with trained ones (see assign_ivf_buckets)."""
    centroids, assigned = assign_ivf_buckets(
        corpus, n_centroids, id_col, vec_col, centroids=centroids
    )
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
