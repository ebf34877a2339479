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
