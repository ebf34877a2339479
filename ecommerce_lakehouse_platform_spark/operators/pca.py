"""PCA over an embedding column, split the way 100 TB forces it:

* **fit** = one distributed aggregation of the dim×dim second moments
  (:func:`comoment_cells` — the exact fixed-point co-moment frame that
  ``ext_embedding_covariance`` registers and DuckDB-verifies), then an
  O(dim³) symmetric eigensolve on the collected dim(dim+1)/2 cells —
  driver-side numpy on a 64×64 matrix, the canonical epilogue;
* **transform** = a zero-shuffle map-side projection: the k×dim
  component matrix and the mean ride in the plan as constant array
  literals (the same single-Literal-node trick as
  ``operators/kmeans._assign``) and each output coordinate is one
  ``zip_with``/``aggregate`` dot product — whole-stage codegen, no
  UDF, no shuffle, valid for any corpus size.

The eigensolve is floating point (numpy LAPACK), so the MODEL is not
cross-engine reproducible the way the co-moment frame is — which is
why the registry registers the covariance aggregation (bit-exact
differential) and the projection is covered by property tests
(orthonormality, variance ordering against the exact covariance,
reconstruction-error monotonicity) instead of a DuckDB twin.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmeans import SCALE, quantize_vectors


def comoment_cells(df: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle second moments of the (2^-20-quantized) vector
    column: ``(i, j, n, sum_i, sum_j, sum_prod, cov_q)`` with all sums
    BIGINT and ``cov_q`` the covariance on the 2^-40 grid via one
    truncating division — see ``ext_embedding_covariance`` for the
    scale argument (map-side triangle expansion, no corpus self-join,
    shuffle collapses to dim(dim+1)/2 cells; the dim marginals are
    aggregated in their own pass and attached as literals, so the
    result plan is join-free)."""
    # spread a provably-tiny corpus before the dim(dim+1)/2-way cell
    # expansion (operators/spread.py): the triangle transform
    # multiplies per-row work ~2000× at dim 64, and a single-row-group
    # source would serialize it onto one core (r13 profile: 2.5 s
    # single-task stages). Large corpora keep native scan parallelism.
    from .spread import spread_small

    df = spread_small(df, df.columns[0])
    q = quantize_vectors(df, id_col=df.columns[0], vec_col=vec_col).select("q")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    cells = q.select(
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.sequence(i, F.lit(dim - 1)),
                        lambda j: F.struct(
                            i.cast("long").alias("i"),
                            j.cast("long").alias("j"),
                            (
                                F.element_at("q", (i + 1).cast("int"))
                                * F.element_at("q", (j + 1).cast("int"))
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.p")
    pairs = cells.groupBy("i", "j").agg(F.sum("p").alias("sum_prod"))

    # the dim marginals are one map-combined aggregation collapsing to
    # dim rows — collect them and attach as literals (the same
    # O(dim)-driver-state move as broadcasting centroids), so the main
    # plan has NO join and the corpus is scanned exactly twice (cells
    # + marginals) instead of three times with a twice-built broadcast
    marg_rows = (
        q.select(F.posexplode("q").alias("pos", "qv"))
        .groupBy("pos")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_rows = marg_rows[0]["n"] if marg_rows else 0
    sums = [0] * dim
    for r in marg_rows:
        sums[r["pos"]] = r["s"]
    s_arr = F.lit(sums).cast("array<bigint>")
    return pairs.select(
        "i",
        "j",
        F.lit(int(n_rows)).cast("long").alias("n"),
        F.element_at(s_arr, (F.col("i") + 1).cast("int")).alias("sum_i"),
        F.element_at(s_arr, (F.col("j") + 1).cast("int")).alias("sum_j"),
        "sum_prod",
    ).select(
        "i",
        "j",
        "n",
        "sum_i",
        "sum_j",
        "sum_prod",
        # the n·S_ij and S_i·S_j intermediates grow as n² and overflow
        # BIGINT near n ≈ 2×10^4, so they run in DECIMAL(38,0) (exact
        # to ~10^38); the QUOTIENT is a covariance on the 2^-40 grid —
        # always long-ranged — and Spark's decimal DIV (== DuckDB
        # HUGEINT //, verified on negative operands) truncates it back
        # to BIGINT
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sum_prod"
            " - CAST(sum_i AS DECIMAL(38,0)) * sum_j)"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("cov_q"),
    )


@dataclass
class PCAModel:
    """Fitted principal components in the ORIGINAL (unquantized)
    vector space: ``mean[dim]``, ``components[k][dim]`` (rows are unit
    eigenvectors, descending eigenvalue), ``explained_variance[k]``."""

    mean: list[float]
    components: list[list[float]]
    explained_variance: list[float]


def pca_fit(df: DataFrame, dim: int, n_components: int, vec_col: str = "embedding") -> PCAModel:
    """One aggregation pass + driver eigensolve. Collected driver
    state is dim(dim+1)/2 cells — independent of corpus size."""
    import numpy as np

    rows = comoment_cells(df, dim, vec_col).collect()
    cov = np.zeros((dim, dim))
    mean = np.zeros(dim)
    for r in rows:
        c = r["cov_q"] / float(SCALE) ** 2  # back from the 2^-40 grid
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
        if r["i"] == r["j"]:
            mean[r["i"]] = r["sum_i"] / (r["n"] * float(SCALE))
    vals, vecs = np.linalg.eigh(cov)  # ascending; columns are eigenvectors
    order = np.argsort(vals)[::-1][:n_components]
    # sign convention so the model is deterministic: largest-|.|
    # component of each eigenvector is positive
    comps = []
    for k in order:
        v = vecs[:, k]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return PCAModel(
        mean=[float(m) for m in mean],
        components=comps,
        explained_variance=[float(vals[k]) for k in order],
    )


def _dot_minus_mean(vec_col: Column, comp: Column, mean: Column) -> Column:
    """<x - mean, comp> as one fold over zipped (x, comp, mean)."""
    centered = F.zip_with(
        vec_col.cast("array<double>"), mean, lambda x, m: x - m
    )
    return F.aggregate(
        F.zip_with(centered, comp, lambda c, w: c * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col``: the k-dimensional projection of ``vec_col``
    onto the fitted components. Pure projection — the model is two
    constant literals in the plan; zero shuffles at any scale."""
    comp_arr = F.lit(model.components).cast("array<array<double>>")
    mean_arr = F.lit(model.mean).cast("array<double>")
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(len(model.components))),
        lambda i: _dot_minus_mean(
            F.col(vec_col), F.element_at(comp_arr, i), mean_arr
        ),
    )
    return df.withColumn(out_col, proj)
