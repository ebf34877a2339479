"""Sketch-operator accuracy (ext_sketch_profile): the query now carries
its own bounds assertions — HLL distinct counts and approx percentiles
are compared to exact answers inside the aggregation and surfaced as
``*_ok`` booleans (the oracle expects all TRUE). These tests pin the
booleans at both fixture scales and keep a tighter independent
rank-error check on the raw sketch values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark import registry

from .conftest import SF_CORRECTNESS, SF_SMOKE


def test_sketch_bounds_hold_both_scales(spark):
    for sf_dir in (SF_SMOKE, SF_CORRECTNESS):
        rows = registry.QUERIES["ext_sketch_profile"](spark, sf_dir).collect()
        assert rows, sf_dir
        for r in rows:
            for flag in ("hll_texts_ok", "hll_sources_ok", "kll_p50_ok", "kll_p95_ok"):
                assert r[flag] is True, (sf_dir, r["lang"], flag)


def test_approx_percentile_within_rank_error(spark):
    """Independent tight check on the raw sketch: rank error ≤ n/5000
    (±2 ranks of slack for tiny groups), recomputed directly."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = docs.groupBy("lang").agg(
        F.expr("approx_percentile(n_chars, 0.5, 5000)").alias("p50"),
        F.expr("approx_percentile(n_chars, 0.95, 5000)").alias("p95"),
    ).collect()
    for r in rows:
        vals = sorted(
            x["n_chars"]
            for x in docs.filter(F.col("lang") == r["lang"]).select("n_chars").collect()
        )
        n = len(vals)

        def ok(est, q):
            lo = max(0, int(q * n) - max(2, n // 5000) - 1)
            hi = min(n - 1, int(q * n) + max(2, n // 5000) + 1)
            return vals[lo] <= est <= vals[hi]

        assert ok(r["p50"], 0.5), (r["lang"], r["p50"])
        assert ok(r["p95"], 0.95), (r["lang"], r["p95"])
