"""DQ gate behavior + clean_id edge semantics (SURVEY.md §5 items 2-3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.functions.cleaning import clean_id
from ecommerce_lakehouse_platform_spark.functions.math import (
    round2,
    safe_div_null,
    safe_div_zero,
    safe_pct_capped,
)
from ecommerce_lakehouse_platform_spark.operators.dq import DataQualityError, expect


def test_clean_id_semantics(spark):
    df = spark.createDataFrame(
        [("1050.0",), ("1050",), ("7.9",), ("-3.7",), ("abc",), (None,), ("",)],
        ["raw"],
    )
    got = [r.cleaned for r in df.select(clean_id("raw").alias("cleaned")).collect()]
    assert got == ["1050", "1050", "7", "-3", None, None, None]


def test_clean_id_idempotent(spark):
    # gold re-cleans already-clean silver ids (03_gold_aggregate.py:48-49)
    df = spark.createDataFrame([("1050.0",), ("42",)], ["raw"])
    once = df.select(clean_id("raw").alias("c1"))
    twice = once.select(clean_id("c1").alias("c2"))
    assert [r.c2 for r in twice.collect()] == ["1050", "42"]


def test_zero_denominator_conventions(spark):
    df = spark.createDataFrame([(10.0, 0.0), (10.0, 4.0)], ["n", "d"])
    out = df.select(
        safe_div_zero(F.col("n"), F.col("d")).alias("z"),
        safe_div_null(F.col("n"), F.col("d")).alias("u"),
        safe_pct_capped(F.col("n"), F.col("d")).alias("p"),
    ).collect()
    assert (out[0].z, out[0].u, out[0].p) == (0.0, None, 0.0)
    assert (out[1].z, out[1].u, out[1].p) == (2.5, 2.5, 100.0)  # capped


def test_round2_half_up(spark):
    df = spark.createDataFrame([(2.675,), (2.0,), (0.125,)], ["x"])
    got = [r.r for r in df.select(round2(F.col("x")).alias("r")).collect()]
    assert got == [2.68, 2.0, 0.13]  # floor-based half-up, not banker's


def test_expect_gate_raises(spark):
    df = spark.createDataFrame([(1,), (-5,)], ["v"])
    with pytest.raises(DataQualityError):
        expect(df, "nonneg", F.col("v") < 0)
    res = expect(df, "nonneg", F.col("v") < 0, raise_on_failure=False)
    assert res.failures == 1 and not res.passed
    ok = expect(df, "bounded", F.col("v") > 100)
    assert ok.passed


def test_profile_table_one_pass(spark):
    """Pytest anchor for operators/profile.py after ext_profile_orders
    retired from the oracle registry (r12): one-row profile values are
    exact, and the whole profile is a SINGLE partial+final aggregate
    over one scan — no per-column jobs, no joins (profiling a 100 TB
    table costs one pass)."""
    from ecommerce_lakehouse_platform_spark.operators.profile import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 3.5), (4, 7.0)], "k int, v double"
    )
    row = profile_table(
        df, null_cols=["k", "v"], minmax_cols=["v"]
    ).collect()[0]
    assert (
        row.n_rows,
        row.k_nulls,
        row.v_nulls,
        row.v_min,
        row.v_max,
    ) == (4, 1, 1, 3.5, 10.0)
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 2, plan  # one partial+final pair


def test_histogram_fixed_width_bins(spark):
    """Pytest anchor for the fixed-width floor-bin histogram after
    ext_histogram_totals retired from the oracle registry (r12): the
    bin arithmetic (floor(x/width), fixed origin 0 — single pass, no
    data-dependent second scan) stays pinned."""
    df = spark.createDataFrame(
        [(5.0,), (24999.0,), (25000.0,), (77000.0,)], "x double"
    )
    got = {
        r.bin: (r.bin_lo, r.bin_hi, r.n)
        for r in df.groupBy(
            F.floor(F.col("x") / 25000.0).cast("long").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * 25000.0).alias("bin_lo"),
            ((F.col("bin") + 1) * 25000.0).alias("bin_hi"),
            "n",
        )
        .collect()
    }
    assert got == {
        0: (0.0, 25000.0, 2),
        1: (25000.0, 50000.0, 1),
        3: (75000.0, 100000.0, 1),
    }


def test_moving_frame_range_between(spark):
    """Pytest anchor for the trailing-window frame arithmetic after
    ext_moving_revenue retired from the oracle registry (r13): a
    rangeBetween(-6, 0) frame over integer epoch-days must honor
    CALENDAR gaps (days 0, 3, 8, 9: day 8's trailing-7d window spans
    days 2..8, so day 0 falls out), where a rowsBetween frame would
    wrongly keep the last 3 ROWS regardless of gap width."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(0, 10.0), (3, 20.0), (8, 40.0), (9, 80.0)], "day int, rev double"
    )
    w7 = Window.orderBy("day").rangeBetween(-6, 0)
    got = {
        r.day: (r.t7, r.n7)
        for r in df.select(
            "day",
            F.sum("rev").over(w7).alias("t7"),
            F.count(F.lit(1)).over(w7).alias("n7"),
        ).collect()
    }
    assert got == {
        0: (10.0, 1),
        3: (30.0, 2),
        8: (60.0, 2),  # day 0 aged out of the 7-day range (2..8)
        9: (140.0, 3),  # range 3..9 still holds day 3
    }
