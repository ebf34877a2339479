"""Mergeable partial-rollup property (operators/rollup.py):
merge(partials over any split) must equal the one-shot rollup
bit-for-bit — the invariant incremental maintenance rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.rollup import (
    merge_rollups,
    partial_rollup,
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
