"""As-of join: edge-case semantics (inclusive equal-ts match, NULL on
no-preceding-row, deterministic tiebreak) and the single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from ecommerce_lakehouse_platform_spark.operators.asof import as_of_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_edge_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),  # before any right → NULL
            (1, _ts("2024-01-01 12:00:00"), "b"),  # equal ts → inclusive match
            (1, _ts("2024-01-01 13:00:00"), "c"),  # after → latest right
            (2, _ts("2024-01-01 12:30:00"), "d"),  # other key
            (3, _ts("2024-01-01 23:00:00"), "e"),  # key with no right rows
        ],
        "k long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 12:00:00"), 101, 1.0),
            (1, _ts("2024-01-01 12:00:00"), 102, 2.0),  # tie → higher id wins
            (1, _ts("2024-01-01 12:45:00"), 103, 3.0),
            (2, _ts("2024-01-01 12:00:00"), 201, 9.0),
        ],
        "k long, rts timestamp, rid long, val double",
    )
    out = {
        r.tag: r
        for r in as_of_join(
            left, right, keys=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rid",
        ).collect()
    }
    assert len(out) == 5
    assert out["a"].matched_rid is None and out["a"].matched_rts is None
    assert out["b"].matched_rid == 102  # inclusive + tiebreak
    assert out["b"].matched_val == 2.0
    assert out["c"].matched_rid == 103
    assert out["d"].matched_rid == 201
    assert out["e"].matched_rid is None


def test_asof_plan_single_shuffle(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k long, lts timestamp")
    right = spark.createDataFrame([(1, _ts("2024-01-01 09:00:00"), 5)], "k long, rts timestamp, rid long")
    df = as_of_join(left, right, ["k"], "lts", "rts")
    jm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jm)
    # union + one window = exactly one hash exchange; a range-join
    # formulation would add a join exchange plus an aggregation
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_interval_join_boundaries(spark):
    from ecommerce_lakehouse_platform_spark.operators.rangejoin import (
        interval_join,
    )

    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "on_start"),   # == start → in
            (1, _ts("2024-01-01 11:00:00"), "on_end"),     # == end → out
            (1, _ts("2024-01-01 10:59:59"), "inside"),
            (1, _ts("2024-01-01 09:59:59"), "before"),
            (2, _ts("2024-01-01 10:30:00"), "wrong_key"),
            (1, _ts("2024-01-02 03:30:00"), "long_iv"),    # multi-bucket interval
        ],
        "k long, pts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "w1"),
            (1, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 06:00:00"), "w6h"),
            (1, _ts("2024-01-03 00:00:00"), _ts("2024-01-03 00:00:00"), "empty"),
        ],
        "k long, s timestamp, e timestamp, wname string",
    )
    out = interval_join(
        points, intervals, keys=["k"], point_ts="pts", start_ts="s",
        end_ts="e", bucket_width_sec=3600,
    )
    got = {(r.tag, r.wname) for r in out.collect()}
    assert got == {("on_start", "w1"), ("inside", "w1"), ("long_iv", "w6h")}
