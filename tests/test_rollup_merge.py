"""Mergeable partial-rollup property (operators/rollup.py):
merge(partials over any split) must equal the one-shot rollup
bit-for-bit — the invariant incremental maintenance rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.rollup import (
    merge_rollups,
    partial_rollup,
    signed_partial_rollup,
)
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _norm(df):
    return {
        (r["o_orderstatus"], r["n_rows"], str(r["rev"]))
        for r in df.collect()
    }


def test_three_way_split_merge_equals_direct(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    keys = ["o_orderstatus"]
    sums = {"rev": F.col("o_totalprice")}
    direct = partial_rollup(orders, keys, sums)
    # arbitrary uneven 3-way split on the key's hash
    parts = [
        orders.filter(F.abs(F.hash("o_orderkey")) % 3 == i) for i in range(3)
    ]
    merged = merge_rollups(
        [partial_rollup(p, keys, sums) for p in parts], keys
    )
    assert _norm(merged) == _norm(direct)


def test_merge_with_empty_partial_is_identity(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    keys = ["o_orderstatus"]
    sums = {"rev": F.col("o_totalprice")}
    direct = partial_rollup(orders, keys, sums)
    empty = partial_rollup(orders.filter("o_orderkey < 0"), keys, sums)
    merged = merge_rollups([direct, empty], keys)
    assert _norm(merged) == _norm(direct)


def test_cdc_feed_maintains_rollup_through_rewrites(spark, tmp_path):
    """End-to-end incremental maintenance off the table format: a
    rollup seeded from version 0 and folded forward with the SIGNED
    partial over MiniDeltaTable.changes() must equal the from-scratch
    rollup of the latest snapshot, bit for bit — across an append, a
    copy-on-write MERGE (which the feed surfaces as delete+insert),
    and an OPTIMIZE (which the feed must NOT surface at all)."""
    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        MiniDeltaTable,
    )

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    keys = ["o_orderstatus"]
    sums = {"rev": F.col("o_totalprice")}

    t = MiniDeltaTable(spark, str(tmp_path / "orders"))
    half = F.abs(F.hash("o_orderkey")) % 2 == 0
    t.write(orders.filter(half))  # v0
    base = partial_rollup(t.read(version=0), keys, sums)

    t.write(orders.filter(~half), mode="append")  # v1
    upd = (
        orders.orderBy("o_orderkey")
        .limit(7)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .localCheckpoint(eager=True)
    )
    t.merge(upd, keys=["o_orderkey"])  # v2: rewrite, CDC delete+insert
    assert t.optimize() is not None  # v3: invisible to the feed

    feed = t.changes(1)
    assert feed.filter(F.col("_commit_version") == 3).count() == 0
    delta = signed_partial_rollup(feed, keys, sums)
    maintained = merge_rollups([base, delta], keys).filter(
        F.col("n_rows") != 0
    )
    oneshot = partial_rollup(t.read(), keys, sums)
    assert _norm(maintained) == _norm(oneshot)
