"""Z-order layout properties (operators/zorder.py): the interleaved
sort key must give per-chunk locality on EVERY interleaved dimension —
the property min/max data skipping depends on — where a single-column
sort only localizes its own column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.zorder import (
    z_value,
    zorder_repartition,
)
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    # x bits at even positions, y bits at odd: z(3,5) =
    # x=0b011 -> 0b010101 at even = 1+4; y=0b101 -> odd = 2+32
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 5)] == (1 + 4) + (2 + 32)


def _chunk_ranges(rows, n_chunks, dim):
    per = max(1, len(rows) // n_chunks)
    spans = []
    for i in range(0, len(rows), per):
        chunk = rows[i : i + per]
        vals = [r[dim] for r in chunk]
        spans.append(max(vals) - min(vals))
    return sum(spans) / len(spans)


def test_zcurve_localizes_both_dims_vs_single_sort(spark):
    # bucket widths must match the data's domain: unused high bits
    # degenerate the curve into a single-column sort (the same tuning
    # rule as Delta's OPTIMIZE ZORDER cardinality guidance). sf0.001
    # has 150 customers, so 64 buckets keeps both dims fully used.
    orders = load_table(spark, SF_SMOKE, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(64)).cast("long")
    y = F.pmod(F.unix_date(F.col("o_orderdate").cast("date")), F.lit(64)).cast(
        "long"
    )
    base = orders.select(x.alias("x"), y.alias("y")).withColumn(
        "z", z_value([F.col("x"), F.col("y")], bits=6)
    )
    by_z = base.orderBy("z").collect()
    by_date = base.orderBy("y").collect()
    n_chunks = 16
    # date-sorted chunks localize the date... but leave the customer
    # dimension at full range; z-sorted chunks must localize customers
    # far better while keeping dates partially local.
    z_cust = _chunk_ranges(by_z, n_chunks, "x")
    date_cust = _chunk_ranges(by_date, n_chunks, "x")
    assert z_cust < 0.7 * date_cust, (z_cust, date_cust)


def test_zorder_repartition_round_trips_rows(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    x = F.pmod(F.col("o_custkey"), F.lit(1024)).cast("long")
    y = F.pmod(F.unix_date(F.col("o_orderdate").cast("date")), F.lit(1024)).cast(
        "long"
    )
    laid_out = zorder_repartition(orders, [x, y], n_partitions=4, bits=10)
    assert laid_out.rdd.getNumPartitions() == 4
    assert laid_out.count() == orders.count()
    assert sorted(laid_out.columns) == sorted(orders.columns)
