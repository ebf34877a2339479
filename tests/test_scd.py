"""SCD2 collapse + merge upsert operator tests (operators/scd.py):
run detection incl. NULL states and A→B→A reopening, interval
chaining, and merge matched/unmatched semantics.
"""

from __future__ import annotations

from ecommerce_lakehouse_platform_spark.operators.scd import (
    merge_upsert,
    scd2_collapse,
)


def _rows(df):
    return {
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_runs_and_reopen(spark):
    # k=1: a,a,b,a → three intervals (a reopens); k=2: single row
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 20),
            (1, "b", 30),
            (1, "a", 40),
            (2, "x", 5),
        ],
        "k long, state string, ts long",
    )
    out = scd2_collapse(df, ["k"], ["state"], "ts")
    assert _rows(out) == {
        (1, "a", 10, 30, False),
        (1, "a", 40, None, True),
        (1, "b", 30, 40, False),
        (2, "x", 5, None, True),
    }


def test_scd2_null_state_is_a_change(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, None, 2), (1, None, 3), (1, "a", 4)],
        "k long, state string, ts long",
    )
    out = scd2_collapse(df, ["k"], ["state"], "ts")
    assert _rows(out) == {
        (1, None, 2, 4, False),
        (1, "a", 1, 2, False),
        (1, "a", 4, None, True),
    }


def test_scd2_tiebreak_makes_equal_ts_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 10, 2), (1, "a", 10, 1)], "k long, state string, ts long, seq long"
    )
    out = scd2_collapse(df, ["k"], ["state"], "ts", tiebreak_cols=["seq"])
    assert _rows(out) == {
        (1, "a", 10, 10, False),
        (1, "b", 10, None, True),
    }


def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    source = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)], "id long, v double"
    )
    got = sorted((r["id"], r["v"]) for r in merge_upsert(target, source, ["id"]).collect())
    assert got == [(1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)]


def test_diff_of_merge_recovers_the_delta(spark):
    """snapshot_diff(t, merge_upsert(t, delta)) == the changing rows
    of delta — merge and diff are inverses (no deletes involved)."""
    from ecommerce_lakehouse_platform_spark.operators.scd import snapshot_diff

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    # row 2 changes, row 3 is re-asserted unchanged, row 4 is new
    delta = spark.createDataFrame(
        [(2, 99.0), (3, 30.0), (4, 40.0)], "id long, v double"
    )
    merged = merge_upsert(target, delta, ["id"])
    diff = snapshot_diff(target, merged, ["id"], ["v"])
    got = {
        (r["id"], r["change_type"], r["old_v"], r["new_v"])
        for r in diff.collect()
    }
    assert got == {(2, "update", 20.0, 99.0), (4, "insert", None, 40.0)}


def test_merge_upsert_empty_source_is_identity(spark):
    target = spark.createDataFrame([(1, 10.0)], "id long, v double")
    source = target.filter("id < 0")
    assert merge_upsert(target, source, ["id"]).collect() == target.collect()
