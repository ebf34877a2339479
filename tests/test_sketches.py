"""Sketch-operator accuracy bounds (ext_sketch_profile): HLL distinct
counts and approx percentiles must land within their configured error
of the exact answers — the check an implementation-defined sketch gets
instead of a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark import registry

from .conftest import SF_SMOKE
from .oracle_harness import run_oracle


def test_hll_distinct_within_rsd(spark):
    got = {
        r["lang"]: (r["approx_distinct_texts"], r["approx_distinct_sources"])
        for r in registry.QUERIES["ext_sketch_profile"](spark, SF_SMOKE).collect()
    }
    exact = run_oracle(
        """
        SELECT lang, COUNT(DISTINCT text) AS dt, COUNT(DISTINCT source) AS ds
        FROM documents GROUP BY 1
        """,
        SF_SMOKE,
    )
    assert set(got) == set(exact["lang"])
    for _, row in exact.iterrows():
        at, asrc = got[row["lang"]]
        # rsd=0.02 → generous 3-sigma-ish bound of 10%
        assert abs(at - row["dt"]) <= max(2, 0.10 * row["dt"])
        assert abs(asrc - row["ds"]) <= max(2, 0.10 * row["ds"])


def test_approx_percentile_within_rank_error(spark):
    rows = registry.QUERIES["ext_sketch_profile"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for r in rows:
        p50, p95 = r["approx_chars_p50"], r["approx_chars_p95"]
        vals = sorted(
            x["n_chars"]
            for x in docs.filter(F.col("lang") == r["lang"]).select("n_chars").collect()
        )
        n = len(vals)
        # approx_percentile(accuracy=5000) guarantees rank error ≤ n/5000;
        # allow ±2 ranks of slack for tiny groups
        def ok(est, q):
            lo = max(0, int(q * n) - max(2, n // 5000) - 1)
            hi = min(n - 1, int(q * n) + max(2, n // 5000) + 1)
            return vals[lo] <= est <= vals[hi]

        assert ok(p50, 0.5), (r["lang"], p50)
        assert ok(p95, 0.95), (r["lang"], p95)
