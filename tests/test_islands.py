"""Unit tests for operators/islands.py — interval union semantics
the oracle query can't isolate: variable-length intervals where a
long interval absorbs later short ones (lag(start) would split
wrongly; the running max must not), and the max_gap bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.islands import (
    interval_islands,
)


def _islands(spark, rows, max_gap=0):
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = interval_islands(df, ["k"], "s", "e", max_gap=max_gap)
    g = (
        out.groupBy("k", "island_id")
        .agg(F.min("s").alias("s0"), F.max("e").alias("e0"))
        .orderBy("k", "s0")
        .collect()
    )
    return [(r["k"], r["s0"], r["e0"]) for r in g]


def test_long_interval_absorbs_short_ones(spark):
    # [0,100] covers [10,12] and [50,55] — lag(start)-based logic
    # would break at 50 (50 > 12+1); the running max must not.
    # [102,103] leaves unit 101 uncovered => its own island at
    # max_gap=0, bridged at max_gap=1.
    rows = [("a", 0, 100), ("a", 10, 12), ("a", 50, 55), ("a", 102, 103)]
    assert _islands(spark, rows) == [("a", 0, 100), ("a", 102, 103)]
    assert _islands(spark, rows, max_gap=1) == [("a", 0, 103)]


def test_gap_splits_islands(spark):
    rows = [("a", 0, 5), ("a", 7, 9), ("b", 0, 1)]
    # 7 > 5 + 1 => new island; key b independent
    assert _islands(spark, rows) == [("a", 0, 5), ("a", 7, 9), ("b", 0, 1)]


def test_adjacent_merges(spark):
    rows = [("a", 0, 5), ("a", 6, 9)]
    assert _islands(spark, rows) == [("a", 0, 9)]


def test_max_gap_bridges(spark):
    rows = [("a", 0, 5), ("a", 8, 9)]
    # gap of 2 uncovered units (6,7): split at max_gap=0/1, merged at 2
    assert _islands(spark, rows, max_gap=0) == [("a", 0, 5), ("a", 8, 9)]
    assert _islands(spark, rows, max_gap=1) == [("a", 0, 5), ("a", 8, 9)]
    assert _islands(spark, rows, max_gap=2) == [("a", 0, 9)]


def test_island_ids_are_one_based_and_ordered(spark):
    rows = [("a", 20, 21), ("a", 0, 1), ("a", 10, 11)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = interval_islands(df, ["k"], "s", "e").orderBy("s").collect()
    assert [r["island_id"] for r in out] == [1, 2, 3]


# --- property: Spark island merge == brute-force Python merge ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_INTERVAL = st.tuples(
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=0, max_value=12),
)


def _brute_merge(intervals, max_gap):
    """Reference union: sort by (start, end), sweep with running max."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + 1 + max_gap:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_INTERVAL, min_size=1, max_size=40),
    st.sampled_from([0, 1, 3]),
)
def test_islands_match_brute_force(spark, raw, max_gap):
    rows = [("k", s, s + ln) for s, ln in raw]
    got = _islands(spark, rows, max_gap=max_gap)
    want = [
        ("k", s, e) for s, e in _brute_merge([(s, e) for _, s, e in rows], max_gap)
    ]
    assert got == want
