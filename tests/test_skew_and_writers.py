"""Salted-join equivalence + writer/catalog helper coverage."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.skew import salted_join
from ecommerce_lakehouse_platform_spark.sources.writers import (
    peek,
    read_table,
    table_counts,
    write_table,
)


def test_salted_join_equals_plain_join(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("k")
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "v"])
    plain = sorted(
        map(tuple, fact.join(dim, ["k"], "left").select("rid", "v").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(fact, dim, ["k"], "rid", "left", 8)
            .select("rid", "v")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_preserves_unmatched_left_rows(spark):
    fact = spark.createDataFrame([(100, 99)], ["rid", "k"])
    dim = spark.createDataFrame([(0, "a")], ["k", "v"])
    out = salted_join(fact, dim, ["k"], "rid", "left", 4).collect()
    assert len(out) == 1 and out[0].v is None


def test_write_read_peek_counts(spark):
    tmp = tempfile.mkdtemp(prefix="wr_")
    try:
        df = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 5).alias("bucket")
        )
        write_table(df, f"{tmp}/t", partition_by="bucket")
        back = read_table(spark, f"{tmp}/t")
        assert back.count() == 100
        assert len(peek(back, 7)) == 7
        assert table_counts({"t": back}) == {"t": 100}
        # overwrite is idempotent
        write_table(df, f"{tmp}/t", partition_by="bucket")
        assert read_table(spark, f"{tmp}/t").count() == 100
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
