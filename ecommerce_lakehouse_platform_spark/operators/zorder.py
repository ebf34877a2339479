"""Z-order (Morton) interleaving — multi-dimensional clustering for
data skipping.

A date-partitioned layout (the reference's only layout tool,
/root/reference/02_silver/02_silver_transform.py:33) prunes date
predicates but nothing else: a customer-keyed probe still scans every
file. Interleaving the bits of several bucketed key columns into one
sort key gives every file a tight min/max range on ALL participating
dimensions at once, so parquet/Delta min-max skipping fires for
predicates on any of them — the same idea behind Delta's OPTIMIZE
ZORDER BY and databases' space-filling-curve clustering.

``z_value`` is pure integer bit arithmetic (shift/and/or), fully
codegen-friendly and engine-portable: the DuckDB oracle reproduces it
bit-for-bit (ext_zorder_layout). ``zorder_repartition`` applies it as
a range-partition + within-partition sort — the write-side layout
step; the locality win is asserted in tests/test_zorder.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "zorder_repartition"]


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (bit i of
    column j lands at position ``i * len(cols) + j``). Inputs must be
    non-negative integers already bucketed into ``[0, 2^bits)``;
    callers bucket with ``pmod``/``%``. Output is a long."""
    ncols = len(cols)
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(bit, i * ncols + j)
    return acc


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[Column],
    n_partitions: int,
    bits: int = 16,
    z_col: str = "_zvalue",
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: range-partition
    on the z-value (contiguous curve segments per output file) and
    sort within partitions. Write the result with ``write_table`` and
    every file carries tight min/max on every interleaved dimension.
    The helper column is dropped from the result."""
    with_z = df.withColumn(z_col, z_value(cols, bits))
    return (
        with_z.repartitionByRange(n_partitions, F.col(z_col))
        .sortWithinPartitions(z_col)
        .drop(z_col)
    )
