"""Scalar quantization (operators/quantize.py): exactness of the
integer code/dequant arithmetic, the per-step error bound, plan
shape, and search recall over the compressed column."""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators import quantize
from ecommerce_lakehouse_platform_spark.operators.kmeans import SCALE
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE

_SCHEMA = "vec_id long, embedding array<float>"


def _vectors(n: int, dim: int = 8):
    out = []
    for i in range(n):
        out.append((i, [((i * 31 + j * 17) % 97) / 9.7 - 5.0 for j in range(dim)]))
    return out


def _f32(v: float) -> float:
    return struct.unpack("f", struct.pack("f", v))[0]


def test_sq8_codes_and_dequant_match_reference(spark):
    """Codes equal the pure-Python floor arithmetic on the same grid,
    live in 0..255, and dequantization lands within ONE quantization
    step of the original grid value on every coordinate."""
    rows = _vectors(40)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows], _SCHEMA
    )
    cal = quantize.sq8_calibrate(df, dim=8)
    mn, mx = cal
    grid = {i: [math.floor(_f32(v) * SCALE) for v in vec] for i, vec in rows}
    # driver-side replica of the documented arithmetic
    def ref_code(v, j):
        span = mx[j] - mn[j]
        return 0 if span <= 0 else (v - mn[j]) * 255 // span

    got = {r["vec_id"]: list(r["codes"])
           for r in quantize.sq8_encode(df, cal).collect()}
    for i, g in grid.items():
        assert got[i] == [ref_code(v, j) for j, v in enumerate(g)]
        assert all(0 <= c <= 255 for c in got[i])
    deq = {r["vec_id"]: list(r["deq"]) for r in quantize.sq8_dequantize(
        quantize.sq8_encode(df, cal), cal).collect()}
    for i, g in grid.items():
        for j, (v, d) in enumerate(zip(g, deq[i])):
            step = max(1, -(-(mx[j] - mn[j]) // 255))  # ceil(span/255)
            assert abs(v - d) <= step, (i, j, v, d, step)


def test_sq8_degenerate_dimension_is_exact(spark):
    """A constant dimension (span 0) must code to 0 and reconstruct
    the constant exactly — no division by zero, no drift."""
    df = spark.createDataFrame(
        [(0, [1.5, 2.0]), (1, [1.5, 3.0]), (2, [1.5, 2.5])],
        "vec_id long, embedding array<float>",
    )
    cal = quantize.sq8_calibrate(df, dim=2)
    deq = {r["vec_id"]: list(r["deq"]) for r in quantize.sq8_dequantize(
        quantize.sq8_encode(df, cal), cal).collect()}
    expect = math.floor(_f32(1.5) * SCALE)
    assert all(d[0] == expect for d in deq.values())


def test_sq8_encode_is_zero_shuffle(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cal = quantize.sq8_calibrate(emb, dim=64)
    plan = (
        quantize.sq8_encode(emb, cal)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the encode itself stays a pure projection; the single allowed
    # Exchange is the spread_small repartition that parallelizes the
    # compute-dense downstream over a provably-tiny (single-row-group)
    # source — it self-disables past the input-size gate, so nothing
    # data-proportional is shuffled at scale (r14; same pin shape as
    # test_pca.test_comoment_plan_shape)
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_sq8_topk_recall_vs_exact(spark):
    """Search over the compressed column ranks true neighbors well:
    recall@5 vs exact grid-integer L2 top-5, same floor as the
    PQ/IVF recall tests."""
    rows = _vectors(60, dim=16)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>",
    )
    cal = quantize.sq8_calibrate(df, dim=16)
    codes = quantize.sq8_encode(df, cal)
    queries = df.filter(F.col("vec_id") < 8)
    approx = quantize.sq8_topk(codes, cal, queries, k=5).collect()
    pts = {i: [math.floor(_f32(v) * SCALE) for v in vec] for i, vec in rows}
    exact = set()
    for qid in range(8):
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(pts[qid], pts[i])), i)
            for i in pts
            if i != qid
        )[:5]
        exact |= {(qid, i) for _, i in dists}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(got) == 8 * 5
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, f"SQ8 recall@5 unexpectedly low: {recall}"


def test_sq8_topk_ivf_buckets_and_recalls(spark):
    """IVF over the compressed column: the candidate join is a
    broadcast equi-join on bucket_id (no cartesian against the
    corpus), widening nprobe can only improve results, and at full
    probe width the answer EQUALS brute-force SQ8 search exactly."""
    from ecommerce_lakehouse_platform_spark.operators import kmeans

    rows = _vectors(80, dim=16)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>",
    )
    cal = quantize.sq8_calibrate(df, dim=16)
    codes = quantize.sq8_encode(df, cal)
    cents = kmeans.kmeans_fit(df, k=4, n_iters=2)
    queries = df.filter(F.col("vec_id") < 6)

    out = quantize.sq8_topk_ivf(codes, cal, queries, cents, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan

    def pairs(df_):
        return {(r["query_id"], r["neighbor_id"], r["sq_dist"])
                for r in df_.collect()}

    brute = pairs(quantize.sq8_topk(codes, cal, queries, k=5))
    probed = pairs(out)
    assert len(probed) <= 6 * 5
    # recall vs brute SQ8 at nprobe=2 of 4 buckets
    recall = len(brute & probed) / len(brute)
    assert recall >= 0.5, f"IVF-SQ8 recall vs brute SQ8 too low: {recall}"
    # full probe width == brute force exactly (same distances, same ties)
    full = pairs(
        quantize.sq8_topk_ivf(codes, cal, queries, cents, k=5, nprobe=4)
    )
    assert full == brute
