"""Broadcast Bloom filter as a plan literal
(operators/bloom_filter.py): membership exactness against the Python
twin, the no-false-negative guarantee of the zero-join
decontamination, and the zero-shuffle plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators import bloom_filter as B
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _py_positions(value: str, bits: int, hashes: int) -> list[int]:
    return [
        int(
            hashlib.md5(f"bloom{i}:{value}".encode()).hexdigest()[:15], 16
        )
        % bits
        for i in range(hashes)
    ]


def test_bloom_member_matches_python_twin(spark):
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "v string")
    words, bits, hashes = B.bloom_build(df, "v", fpp=1e-6)
    # every inserted key is a member (no false negatives, by Spark)
    probe = spark.createDataFrame(
        [(k,) for k in keys] + [(f"absent-{i}",) for i in range(200)],
        "v string",
    )
    got = {
        r["v"]: r["m"]
        for r in probe.select(
            "v", B.bloom_member(F.col("v"), words, bits, hashes).alias("m")
        ).collect()
    }
    assert all(got[k] for k in keys)
    # at fpp=1e-6, 200 absent probes hit 0 false positives w.h.p.
    absent_hits = [k for k in got if k.startswith("absent-") and got[k]]
    assert not absent_hits, absent_hits
    # the driver-side twin computes the same bit positions
    uwords = [w + (1 << 64) if w < 0 else w for w in words]
    for k in keys[:20]:
        for p in _py_positions(k, bits, hashes):
            assert uwords[p // 64] >> (p % 64) & 1, (k, p)


def test_bloom_decontaminate_no_false_negatives(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    got = {
        r["doc_id"]: r
        for r in B.bloom_decontaminate(corpus, bench, n=3).collect()
    }

    # exact reference: semi-join contamination counts
    from ecommerce_lakehouse_platform_spark.functions import text as T

    sh = lambda df: df.select(
        "doc_id",
        F.explode(F.array_distinct(T.shingles(F.col("text"), 3))).alias("s"),
    )
    bench_sh = sh(bench).select("s").distinct()
    exact = {
        r["doc_id"]: r["n"]
        for r in sh(corpus)
        .join(F.broadcast(bench_sh), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total_excess = 0
    for doc_id, row in got.items():
        want = exact.get(doc_id, 0)
        # no false negatives: bloom count >= exact count, per doc
        assert row["n_contaminated"] >= want, (doc_id, row, want)
        total_excess += row["n_contaminated"] - want
    # and at fpp=1e-4 the overcount is essentially zero
    total_sh = sum(r["n_shingles"] for r in got.values())
    assert total_excess <= max(2, total_sh // 1000), (
        total_excess,
        total_sh,
    )
    # every exactly-contaminated doc at threshold is flagged
    for doc_id, row in got.items():
        if exact.get(doc_id, 0) / row["n_shingles"] >= 0.5:
            assert row["is_contaminated"], doc_id


def test_bloom_decontaminate_zero_shuffle_plan(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    df = B.bloom_decontaminate(corpus, bench, n=3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" not in plan, plan[:1500]
    assert "Exchange" not in plan, plan[:1500]
