"""Scalar quantization (SQ8) for embedding columns: per-dimension
min/max calibration → uint8 codes → dequantized search.

The third member of the vector-compression family next to PQ
(operators/kmeans.pq_encode) and IVF bucketing (operators/similarity):
where PQ trains codebooks, SQ8 is training-free — each dimension is
affinely mapped onto 0..255 (the FAISS ``ScalarQuantizer`` QT_8bit
idea) for a 4× compression of float32 at ~1% recall cost in practice.
The reference has no vector surface; this belongs to the
training-data extension stack (SURVEY.md §2's similarity family).

Spark shape, built for 100 TB:

* CALIBRATION is one map-combined (pos, min, max) aggregate — the
  shuffle carries ≤ dim rows after partial aggregation, and the
  driver sees exactly dim pairs (the same O(model) scalar-collect
  legitimacy class as k-means centroids and the perceptron gradient).
* ENCODING is a zero-shuffle projection: the calibration rides in the
  plan as two array literals, codes come from one ``zip_with`` over
  the 2^-20-grid integers. No UDF, no Python, whole-stage codegen.
* All arithmetic is exact BIGINT on the quantized grid —
  ``code = floor((v − mn)·255 / (mx − mn))`` and
  ``dequant = mn + floor(code·(mx − mn) / 255)`` — so codes and
  reconstructions are bit-identical across engines, partitionings,
  and join orders (magnitudes: |v| ≤ 2^21 on the grid, ×255 < 2^30,
  far inside long range).

Search over the compressed column dequantizes map-side and reuses the
exact top-k machinery; reconstruction error per coordinate is bounded
by one quantization step ⌈(mx − mn)/255⌉, which tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import quantize_vectors


def sq8_calibrate(
    df: DataFrame, dim: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[int], list[int]]:
    """Per-dimension (min, max) on the 2^-20 integer grid: one
    posexplode + map-combined groupBy(pos) — the shuffle is ≤ dim rows
    after partial aggregation; the driver collects exactly dim pairs.
    """
    q = quantize_vectors(df, id_col, vec_col)
    rows = (
        q.select(F.posexplode("q").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    mn = [0] * dim
    mx = [0] * dim
    for r in rows:
        mn[r["pos"]] = r["mn"]
        mx[r["pos"]] = r["mx"]
    return mn, mx


def sq8_encode(
    df: DataFrame,
    calibration: tuple[list[int], list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): uint8 code per dimension, zero-shuffle projection.
    Degenerate dimensions (mx == mn) encode to 0 and dequantize back
    to the constant exactly."""
    mn, mx = calibration
    mn_arr = F.lit([int(x) for x in mn]).cast("array<bigint>")
    span_arr = F.lit(
        [int(b) - int(a) for a, b in zip(mn, mx)]
    ).cast("array<bigint>")
    # spread a provably-tiny corpus before encoding (the r13
    # spread_small gate, same placement as pq_encode): the code column
    # feeds compute-dense consumers (IVF assignment + per-candidate
    # distance folds stack ~k×dim work per row on top of it), and a
    # single-row-group fixture otherwise serializes that whole chain
    # onto one core (r14 profile: a 1.6s single-task stage under
    # ext_sq8_ivf_topk while 31 cores idled). Large corpora keep their
    # native scan parallelism.
    from .spread import spread_small

    q = quantize_vectors(spread_small(df, id_col), id_col, vec_col)
    codes = F.zip_with(
        F.col("q"),
        F.sequence(F.lit(1), F.lit(len(mn))),
        lambda v, i: F.when(
            F.element_at(span_arr, i) > 0,
            F.floor(
                (v - F.element_at(mn_arr, i))
                * F.lit(255)
                / F.element_at(span_arr, i)
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return q.select(id_col, codes.alias("codes"))


def sq8_dequantize(
    codes: DataFrame,
    calibration: tuple[list[int], list[int]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, deq): grid-integer reconstruction from the codes —
    ``mn + floor(code·span/255)`` per dimension, zero-shuffle."""
    mn, mx = calibration
    mn_arr = F.lit([int(x) for x in mn]).cast("array<bigint>")
    span_arr = F.lit(
        [int(b) - int(a) for a, b in zip(mn, mx)]
    ).cast("array<bigint>")
    deq = F.zip_with(
        F.col("codes"),
        F.sequence(F.lit(1), F.lit(len(mn))),
        lambda c, i: F.element_at(mn_arr, i)
        + F.floor(c * F.element_at(span_arr, i) / F.lit(255)),
    )
    return codes.select(id_col, deq.alias("deq"))


def sq8_topk_ivf(
    codes: DataFrame,
    calibration: tuple[list[int], list[int]],
    queries: DataFrame,
    centroids: list[tuple[int, list[int]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF over the COMPRESSED column: bucket the dequantized codes by
    nearest trained centroid (``kmeans_fit``'s model, riding in the
    plan as literals — zero-shuffle assignment), probe each query's
    ``nprobe`` nearest buckets, and score only those candidates —
    the FAISS ``IVF,SQ8`` composition: SQ8 cuts the bytes touched 4×,
    IVF cuts the candidates to ~nprobe/C of the corpus, and neither
    ever reads a stored float. The candidate join is a broadcast
    equi-join on bucket_id (queries × nprobe rows broadcast), never a
    cartesian."""
    from pyspark.sql import Window

    from .kmeans import _assign

    deq = sq8_dequantize(codes, calibration, id_col).withColumnRenamed(
        "deq", "q"
    )
    assigned = _assign(deq, centroids).select(
        id_col, F.col("q").alias("_deq"), F.col("cluster").alias("bucket_id")
    )
    qv = quantize_vectors(queries, id_col, vec_col)
    # query side: rank every centroid distance and keep nprobe buckets
    # (array_sort over (dist, id) structs = the lexicographic ranking)
    cid_arr = F.lit([int(c) for c, _ in centroids]).cast("array<bigint>")
    vec_arr = F.lit(
        [[int(x) for x in v] for _, v in centroids]
    ).cast("array<array<bigint>>")
    per_centroid = F.transform(
        F.sequence(F.lit(1), F.lit(len(centroids))),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    F.element_at(vec_arr, i),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.element_at(cid_arr, i).alias("c"),
        ),
    )
    probes = (
        qv.select(
            F.col(id_col).alias(query_id_col),
            F.col("q").alias("_qv"),
            F.explode(
                F.slice(F.array_sort(per_centroid), 1, nprobe)
            ).alias("_p"),
        )
        .select(query_id_col, "_qv", F.col("_p.c").alias("bucket_id"))
    )
    scored = (
        assigned.join(F.broadcast(probes), ["bucket_id"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    F.col("_deq"), F.col("_qv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy("sq_dist", "neighbor_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sq8_topk(
    codes: DataFrame,
    calibration: tuple[list[int], list[int]],
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k nearest neighbors over the COMPRESSED column:
    dequantize map-side (no stored floats touched), broadcast the
    query vectors, exact squared-L2 on the grid integers, tiebroken
    row_number top-k — the brute-force-over-SQ8 baseline that PQ/IVF
    variants are judged against."""
    from pyspark.sql import Window

    deq = sq8_dequantize(codes, calibration, id_col)
    q = quantize_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias(query_id_col), F.col("q").alias("_qv")
    )
    scored = (
        deq.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    F.col("deq"), F.col("_qv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy("sq_dist", "neighbor_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
