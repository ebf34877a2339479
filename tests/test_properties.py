"""Property-based differential tests (SURVEY.md §5.3): hypothesis
generates adversarial inputs, and Spark and DuckDB must agree exactly
on the semantics the oracle gate depends on — clean_id normalization
and the portable half-up rounding.

Each example runs a whole batch through one Spark job to keep the
Spark-per-example overhead sane.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.functions.cleaning import clean_id
from ecommerce_lakehouse_platform_spark.functions.math import roundn

# numeric-ish strings, garbage, whitespace oddities, overflow, NULLs.
# Excluded from the fuzz domain (pinned in
# test_known_literal_syntax_divergences instead): underscore digit
# separators and Java d/f suffixes — numeric-LITERAL syntax where the
# engines legitimately differ and which cannot occur in the oracle's
# input domain (fixture IDs are stringified integers).
_ID_STRINGS = st.one_of(
    st.from_regex(r"-?[0-9]{1,18}(\.[0-9]{0,6})?", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,5}[eE][+-]?[0-9]{1,2}", fullmatch=True),
    st.sampled_from(
        ["", " ", "  42  ", "abc", "12abc", "-", ".", "1.2.3", "NaN", "nan",
         "Infinity", "-Infinity", "inf", "1e308", "1e309", "9" * 25,
         "0x1A", "+7", "--3", "١٢٣"]
    ),
    st.none(),
)


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ID_STRINGS, min_size=1, max_size=80))
def test_clean_id_matches_duckdb(spark, ddb, values):
    got = [
        r.out
        for r in spark.createDataFrame(
            [(v,) for v in values], "v string"
        ).select(clean_id("v").alias("out")).collect()
    ]
    want = [
        r[0]
        for r in ddb.execute(
            """
            SELECT CAST(TRY_CAST(TRUNC(TRY_CAST(v AS DOUBLE)) AS BIGINT) AS VARCHAR)
            FROM (SELECT unnest(?::VARCHAR[]) AS v)
            """,
            [values],
        ).fetchall()
    ]
    assert got == want, f"diverged on {values}"


def test_known_literal_syntax_divergences(spark, ddb):
    """The engines parse numeric LITERALS differently in three known
    ways; clean_id's oracle domain (stringified integer ids) cannot
    contain them, but they are pinned here so a behavior change in
    either engine is noticed."""
    cases = ["1_000", "1d", "1f"]
    got = [
        r.o
        for r in spark.createDataFrame([(c,) for c in cases], "v string")
        .select(clean_id("v").alias("o"))
        .collect()
    ]
    want = [
        r[0]
        for r in ddb.execute(
            "SELECT CAST(TRY_CAST(TRUNC(TRY_CAST(v AS DOUBLE)) AS BIGINT) AS VARCHAR) "
            "FROM (SELECT unnest(?::VARCHAR[]) AS v)",
            [cases],
        ).fetchall()
    ]
    # DuckDB reads underscore digit separators; Spark reads Java d/f
    # floating suffixes
    assert got == [None, "1", "1"]
    assert want == ["1000", None, None]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=80,
    )
)
def test_roundn_matches_duckdb_floor_formula(spark, ddb, values):
    """roundn is defined as floor(x*100+0.5)/100 in BOTH engines —
    the formula itself must agree bit-for-bit on doubles (this is why
    the oracles use it rather than each engine's ROUND)."""
    got = [
        r.out
        for r in spark.createDataFrame(
            [(v,) for v in values], "v double"
        ).select(roundn(F.col("v"), 2).alias("out")).collect()
    ]
    want = [
        r[0]
        for r in ddb.execute(
            "SELECT FLOOR(v * 100.0 + 0.5) / 100.0 "
            "FROM (SELECT unnest(?::DOUBLE[]) AS v)",
            [values],
        ).fetchall()
    ]
    assert got == want, f"diverged on {values}"


# ---------------------------------------------------------------------------
# Prefix-filter exactness under adversarial corpora
# ---------------------------------------------------------------------------

_TINY_VOCAB = ["aa", "bb", "cc", "dd", "ee"]
_DOC = st.lists(st.sampled_from(_TINY_VOCAB), min_size=0, max_size=12)


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=10), st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_filter_matches_all_pairs_on_random_corpora(spark, docs, threshold):
    """PPJoin prefix filtering must be exact — no false negatives from
    the candidate rule, none from ties in the (df, shingle) ordering —
    on tiny-vocab corpora engineered for maximal shingle collisions,
    including empty docs and docs shorter than the shingle width."""
    from ecommerce_lakehouse_platform_spark.operators import neardup

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id LONG, text STRING",
    )
    exact = {
        (r["doc_a"], r["doc_b"], r["n_shared"], r["jaccard"])
        for r in neardup.ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    pf = {
        (r["doc_a"], r["doc_b"], r["n_shared"], r["jaccard"])
        for r in neardup.prefix_filter_jaccard_pairs(df, threshold=threshold).collect()
    }
    assert pf == exact


# ---------------------------------------------------------------------------
# ln()/floor quantization parity (r4 advice: kill the ULP risk in
# ext_lm_perplexity / ext_weighted_sample / ext_bm25_topk / ext_dsir)
# ---------------------------------------------------------------------------


def test_weighted_sample_log_domain_margin():
    """ext_weighted_sample quantizes L = floor(-ln(u)·1e6) over u's
    FINITE domain {(k+0.5)/1e6 : k ∈ [0, 1e6)}. Scan the whole domain
    and assert every value of -ln(u)·1e6 sits ≥ 1e-7 from a floor
    boundary — ~50× the worst-case libm ULP at this magnitude
    (~2e-9), so no platform's ln() can flip any floor and the
    downstream BIGINT-division key is engine-exact by construction.
    The measured minimum is 2.675e-7 at k = 858058."""
    import numpy as np

    k = np.arange(1_000_000, dtype=np.float64)
    x = -np.log((k + 0.5) / 1_000_000.0) * 1_000_000.0
    dist = np.abs(x - np.rint(x))
    assert float(dist.min()) > 1e-7, (
        f"floor-boundary margin collapsed: min={dist.min()} "
        f"at k={int(dist.argmin())}"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_000),   # c_bg
            st.integers(min_value=1, max_value=100_000_000),  # c_prev
            st.integers(min_value=1, max_value=1_000_000),    # v
        ),
        min_size=1,
        max_size=60,
    )
)
def test_nll_e4_quantization_matches_duckdb(spark, ddb, triples):
    """The lm-perplexity quantization floor(-ln((c+1)/(p+v))·1e4) must
    agree between the JVM (java.lang.Math.log via Catalyst) and DuckDB
    (libm) for arbitrary count triples — the 1e4 quantum leaves a
    multi-ULP divergence ~7 orders of magnitude short of a boundary.
    One Spark job per hypothesis example (batch of triples)."""
    rows = [(i, a, b, c) for i, (a, b, c) in enumerate(triples)]
    sdf = spark.createDataFrame(rows, "i long, c_bg long, c_prev long, v long")
    got = {
        r["i"]: r["q"]
        for r in sdf.select(
            "i",
            F.floor(
                -F.log(
                    (F.col("c_bg") + F.lit(1.0)) / (F.col("c_prev") + F.col("v"))
                )
                * F.lit(10000.0)
            ).cast("long").alias("q"),
        ).collect()
    }
    want = {
        i: q
        for i, q in ddb.execute(
            "SELECT i, CAST(floor(-ln((c_bg + 1.0) / (c_prev + v)) * 10000)"
            "       AS BIGINT) "
            "FROM (SELECT unnest($1, recursive := true)) "
            "t(i, c_bg, c_prev, v)",
            [[{"i": i, "c_bg": a, "c_prev": b, "v": c} for i, a, b, c in rows]],
        ).fetchall()
    }
    assert got == want


def test_nll_e4_quantization_near_boundary_adversarial(spark, ddb):
    """Deterministic hammer at the floor boundaries themselves: scan
    count triples for the ones whose -ln((c+1)/(p+v))·1e4 lands
    CLOSEST to an integer (the only places a libm divergence could
    ever matter) and require Spark and DuckDB to floor them
    identically. math.log (CPython) is a third libm lineage, so the
    triples chosen adversarially against it exercise genuinely tight
    boundaries for the other two engines."""
    import math

    cand: list[tuple[float, int, int, int]] = []
    for c_bg in range(1, 400):
        for c_prev in range(c_bg, 4000, 7):
            v = 1 + (c_bg * 31 + c_prev) % 997
            x = -math.log((c_bg + 1.0) / (c_prev + v)) * 10000.0
            cand.append((abs(x - round(x)), c_bg, c_prev, v))
    cand.sort()
    rows = [(i, a, b, c) for i, (_, a, b, c) in enumerate(cand[:200])]
    sdf = spark.createDataFrame(rows, "i long, c_bg long, c_prev long, v long")
    got = sorted(
        (r["i"], r["q"])
        for r in sdf.select(
            "i",
            F.floor(
                -F.log(
                    (F.col("c_bg") + F.lit(1.0)) / (F.col("c_prev") + F.col("v"))
                )
                * F.lit(10000.0)
            ).cast("long").alias("q"),
        ).collect()
    )
    want = sorted(
        ddb.execute(
            "SELECT i, CAST(floor(-ln((c_bg + 1.0) / (c_prev + v)) * 10000)"
            "       AS BIGINT) "
            "FROM (SELECT unnest($1, recursive := true)) "
            "t(i, c_bg, c_prev, v)",
            [[{"i": i, "c_bg": a, "c_prev": b, "v": c} for i, a, b, c in rows]],
        ).fetchall()
    )
    assert got == want
