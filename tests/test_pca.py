"""PCA (operators/pca.py): the fit aggregation is oracle-paired via
ext_embedding_covariance; these tests cover the eigensolve epilogue
and the zero-shuffle projection — orthonormal components, projected
variance agreeing with the exact covariance's eigenvalues, and
reconstruction error that improves with k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators import pca
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE

DIM = 64


def _fit(spark, k):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb, pca.pca_fit(emb, dim=DIM, n_components=k)


def test_components_orthonormal_and_variance_ordered(spark):
    _, model = _fit(spark, 8)
    assert len(model.components) == 8
    for a in range(8):
        for b in range(8):
            dot = sum(
                x * y
                for x, y in zip(model.components[a], model.components[b])
            )
            want = 1.0 if a == b else 0.0
            assert abs(dot - want) < 1e-9
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert all(v >= 0 for v in ev)


def test_projected_variance_matches_eigenvalues(spark):
    emb, model = _fit(spark, 4)
    proj = pca.pca_project(emb, model)
    rows = proj.select("pca").collect()
    n = len(rows)
    for k in range(4):
        vals = [r["pca"][k] for r in rows]
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / n
        # projection runs on the raw floats, the covariance on the
        # 2^-20 grid — agreement to the quantization scale
        assert math.isclose(var, model.explained_variance[k], rel_tol=1e-4)


def test_reconstruction_error_improves_with_k(spark):
    emb, m8 = _fit(spark, 8)
    m2 = pca.PCAModel(
        mean=m8.mean,
        components=m8.components[:2],
        explained_variance=m8.explained_variance[:2],
    )

    def sq_residual(model):
        proj = pca.pca_project(emb, model)
        rows = proj.select("embedding", "pca").collect()
        total = 0.0
        for r in rows:
            centered = [x - m for x, m in zip(r["embedding"], model.mean)]
            recon = [
                sum(c * r["pca"][k] for k, c in enumerate(col))
                for col in zip(*model.components)
            ]
            total += sum((a - b) ** 2 for a, b in zip(centered, recon))
        return total

    assert sq_residual(m8) < sq_residual(m2)


def test_comoment_exact_where_bigint_intermediates_overflow(spark):
    """25k rows of near-unit components put n*sum_prod past 2^63 — the
    regime where a pure-BIGINT (n*S_ij - S_i*S_j) DIV n^2 would
    overflow (ANSI throw or wrap). The DECIMAL(38,0)-routed division
    must stay exact; verified cell-by-cell against plain Python ints."""
    n, d = 25_000, 4
    muls = [2654435761, 40503, 2246822519, 3266489917]
    vec = F.array(
        *[
            ((F.col("id") * F.lit(m)) % 1024 - 512) / F.lit(512.0)
            for m in muls
        ]
    )
    df = spark.range(n).select(F.col("id").alias("vid"), vec.alias("embedding"))
    got = {
        (r["i"], r["j"]): (r["n"], r["sum_i"], r["sum_j"], r["sum_prod"], r["cov_q"])
        for r in pca.comoment_cells(df, dim=d).collect()
    }

    qs = [
        [
            math.floor((((i * m) % 1024 - 512) / 512.0) * pca.SCALE)
            for m in muls
        ]
        for i in range(n)
    ]
    s = [sum(q[k] for q in qs) for k in range(d)]
    assert len(got) == d * (d + 1) // 2
    overflow_seen = False
    for i in range(d):
        for j in range(i, d):
            sp = sum(q[i] * q[j] for q in qs)
            num = n * sp - s[i] * s[j]
            if abs(n * sp) > 2**63 or abs(s[i] * s[j]) > 2**63:
                overflow_seen = True
            cov = abs(num) // (n * n) * (1 if num >= 0 else -1)
            assert got[(i, j)] == (n, s[i], s[j], sp, cov)
    assert overflow_seen  # the test actually exercises the wide regime


def test_comoment_plan_shape(spark):
    """The co-moment aggregation shuffles only the collapsed cell /
    marginal aggregates (partial agg first), joins the marginals by
    broadcast, and never forms a corpus self-join."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        pca.comoment_cells(emb, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan
    # no join at all: marginals ride as literals; the exchanges are
    # the collapsed (i,j) cell aggregation plus (small inputs only)
    # the spread_small repartition that parallelizes the dim²-way
    # cell expansion — the latter self-disables past the provably-tiny
    # input bound, so neither is data-proportional at scale
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_projection_is_shuffle_free(spark):
    emb, model = _fit(spark, 4)
    plan = (
        pca.pca_project(emb, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan
