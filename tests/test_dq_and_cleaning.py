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
