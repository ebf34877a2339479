"""Source/sink format round-trips: every format a switcher would
bring data in with (parquet, ORC, JSON-lines, CSV) must round-trip the
silver orders model losslessly under an EXPLICIT schema (the engine
never relies on schema inference off the bronze edge — SURVEY.md §1).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.plans.silver import silver_orders
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _canon(df):
    rows = df.select(
        "order_id", "customer_id", "status", "total_usd",
        F.col("order_date").cast("string").alias("order_date"),
    ).collect()
    return sorted((r[0], r[1], r[2], r[3], r[4]) for r in rows)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_silver_orders_round_trips(spark, fmt):
    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    tmp = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        writer = base.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.save(tmp)
        reader = spark.read.format(fmt).schema(base.schema)
        if fmt == "csv":
            reader = reader.option("header", True)
        back = reader.load(tmp)
        assert back.schema == base.schema
        assert _canon(back) == _canon(base)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_silver_orders_round_trips_xml(spark):
    """XML (built-in since Spark 4) round-trip under explicit schema;
    rowTag is mandatory on both edges. Avro is NOT bundled in this
    runtime (external spark-avro module) — a switcher bringing Avro
    data needs the package on the classpath; nothing else changes."""
    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    tmp = tempfile.mkdtemp(prefix="fmt_xml_")
    try:
        base.write.mode("overwrite").format("xml").option(
            "rootTag", "orders"
        ).option("rowTag", "order").save(tmp)
        back = (
            spark.read.format("xml")
            .schema(base.schema)
            .option("rowTag", "order")
            .load(tmp)
        )
        assert back.schema == base.schema
        assert _canon(back) == _canon(base)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _table_format_available(spark, fmt: str) -> bool:
    """True when the lakehouse table format's runtime is actually on
    the classpath (delta-spark / iceberg-spark-runtime). This sandbox
    ships neither, so these tests normally SKIP — the point is that
    the moment the jar is present, the real-format branch of
    write_table (sources/writers.py) is exercised instead of silently
    falling back to parquet forever."""
    try:
        if fmt == "delta":
            import delta  # noqa: F401

            return True
        if fmt == "iceberg":
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
    except Exception:
        return False
    return False


def test_delta_overwrite_schema_evolution(spark):
    """The reference's core sink is managed Delta with overwriteSchema
    (/root/reference/02_silver/02_silver_transform.py:29-37): a full
    overwrite may WIDEN the schema. Round-trip an overwrite that adds
    a column through write_table's delta branch and read it back."""
    if not _table_format_available(spark, "delta"):
        pytest.skip("delta-spark runtime not on the classpath")
    from ecommerce_lakehouse_platform_spark.sources.writers import write_table

    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    tmp = tempfile.mkdtemp(prefix="fmt_delta_")
    try:
        write_table(base, tmp, fmt="delta")
        evolved = base.withColumn("load_round", F.lit(2))
        write_table(evolved, tmp, fmt="delta")  # overwriteSchema branch
        back = spark.read.format("delta").load(tmp)
        assert set(back.columns) == set(evolved.columns)
        assert back.count() == base.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_iceberg_overwrite_round_trip(spark):
    """Iceberg twin of the Delta probe for deployments standardized on
    Iceberg: same overwrite semantics through the catalog API."""
    if not _table_format_available(spark, "iceberg"):
        pytest.skip("iceberg-spark runtime not on the classpath")
    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.fmt_probe")
    try:
        base.writeTo("local.fmt_probe.orders").createOrReplace()
        back = spark.table("local.fmt_probe.orders")
        assert back.schema == base.schema
        assert _canon(back) == _canon(base)
    finally:
        spark.sql("DROP TABLE IF EXISTS local.fmt_probe.orders")


def test_real_delta_parity_with_minidelta(spark):
    """r12 (VERDICT task 6): the moment the real delta-spark runtime
    is on the classpath, round-trip one silver table through real
    ``format("delta")`` AND through the in-repo minidelta protocol
    sink, and assert the two reads are value-identical — the
    substitution documented in sources/writers.py is only honest
    while this parity holds. SKIPS in this sandbox (no delta-spark);
    a CI image that ships the jar exercises it automatically."""
    if not _table_format_available(spark, "delta"):
        pytest.skip("delta-spark runtime not on the classpath")
    from ecommerce_lakehouse_platform_spark.sources.writers import (
        read_table,
        write_table,
    )

    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    real_dir = tempfile.mkdtemp(prefix="fmt_delta_real_")
    mini_dir = tempfile.mkdtemp(prefix="fmt_delta_mini_")
    try:
        write_table(base, real_dir, fmt="delta")
        write_table(base, mini_dir, fmt="minidelta")
        real = read_table(spark, real_dir, fmt="delta")
        mini = read_table(spark, mini_dir, fmt="minidelta")
        assert real.schema == mini.schema
        assert _canon(real) == _canon(mini)
        # overwrite-with-evolution parity too (the reference's blanket
        # overwriteSchema contract): both sinks must land the widened
        # relation
        evolved = base.withColumn("load_round", F.lit(2))
        write_table(evolved, real_dir, fmt="delta")
        write_table(evolved, mini_dir, fmt="minidelta")
        real2 = read_table(spark, real_dir, fmt="delta")
        mini2 = read_table(spark, mini_dir, fmt="minidelta")
        assert set(real2.columns) == set(mini2.columns)
        assert _canon(real2) == _canon(mini2)
        assert real2.count() == mini2.count() == base.count()
    finally:
        shutil.rmtree(real_dir, ignore_errors=True)
        shutil.rmtree(mini_dir, ignore_errors=True)


def test_minidelta_reader_replays_vendored_real_log(spark):
    """r13 (VERDICT task 4): reader interop WITHOUT the delta-spark
    runtime. tests/fixtures/real_delta_table carries a ``_delta_log``
    hand-assembled in the PUBLIC delta-spark on-disk dialect
    (tools/make_real_delta_fixture.py — commitInfo with
    engineInfo/isBlindAppend/txnId/operationMetrics, adds with
    partitionValues + stats incl. nullCount, a remove with
    extendedFileMetadata: fields MiniDeltaTable itself never writes).
    The minidelta reader must replay snapshot, time travel, the CDF
    fold, timestamp resolution, and stats-based data skipping from
    that FOREIGN log. Copy-on-read into a temp dir: the vendored
    fixture stays byte-pristine."""
    import os

    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        MiniDeltaTable,
    )

    src = os.path.join(
        os.path.dirname(__file__), "fixtures", "real_delta_table"
    )
    tmp = tempfile.mkdtemp(prefix="real_delta_interop_")
    try:
        dst = os.path.join(tmp, "t")
        shutil.copytree(src, dst)
        t = MiniDeltaTable(spark, dst)

        # latest snapshot: v2 removed part-00001 (k=2,3) and rewrote
        # the surviving row (k=3)
        latest = {(r.k, r.s) for r in t.read().collect()}
        assert latest == {
            (0, "alpha"), (1, "bravo"), (3, "delta"), (4, "echo")
        }
        # time travel: v0 pre-append pre-delete, v1 adds k=4
        assert {r.k for r in t.read(version=0).collect()} == {0, 1, 2, 3}
        assert {r.k for r in t.read(version=1).collect()} == {0, 1, 2, 3, 4}
        # TIMESTAMP AS OF from the foreign commitInfo timestamps
        assert t.version_at_timestamp(1700000060000) == 1
        assert t.version_at_timestamp(1700000119999) == 1

        # CDF fold: k=2 nets out (insert v0 + delete v2); k=3 has 3
        # row events (insert v0, delete+reinsert v2); k=0,1,4 one each
        cdf = t.changes(0)
        fold = {
            r.k: (r.net, r.n)
            for r in cdf.groupBy("k")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
                ).alias("net"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert fold == {
            0: (1, 1), 1: (1, 1), 2: (0, 2), 3: (1, 3), 4: (1, 1)
        }

        # data skipping reads the FOREIGN stats strings: k ∈ [4, 9]
        # can only live in part-00002
        plan_files = t.files_for_range("k", 4, 9)
        assert len(plan_files) == 1 and "part-00002" in plan_files[0]
        assert {r.k for r in t.read(where=("k", 4, 9)).collect()} == {4}

        # and the minidelta WRITER can extend the foreign log: an
        # append composes (the real writer's protocol 1/2 accepted)
        t.write(
            spark.createDataFrame([(9, "foxtrot")], "k long, s string")
            .coalesce(1),
            mode="append",
        )
        assert {r.k for r in t.read().collect()} == {0, 1, 3, 4, 9}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_minidelta_replays_foreign_classic_checkpoint(spark):
    """r13: the vendored real-dialect log also carries a CLASSIC
    delta-spark checkpoint (txn/add/remove/metaData/protocol struct
    columns, a remove TOMBSTONE row, add fields like stats/tags the
    minidelta writer never checkpoints) plus ``_last_checkpoint``.
    With the JSON history deleted (log retention), snapshot replay
    must seed ENTIRELY from the foreign checkpoint: rows, schema, the
    tombstone skipped, and the streaming txn ledger recovered."""
    import os

    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        MiniDeltaTable,
    )

    src = os.path.join(
        os.path.dirname(__file__), "fixtures", "real_delta_table"
    )
    tmp = tempfile.mkdtemp(prefix="real_delta_ckpt_")
    try:
        dst = os.path.join(tmp, "t")
        shutil.copytree(src, dst)
        for v in range(3):  # expire the JSON history
            os.unlink(os.path.join(dst, "_delta_log", f"{v:020d}.json"))
        t = MiniDeltaTable(spark, dst)
        assert {(r.k, r.s) for r in t.read().collect()} == {
            (0, "alpha"), (1, "bravo"), (3, "delta"), (4, "echo")
        }
        # the foreign checkpoint's txn row survives into the ledger
        assert t.last_txn_version("some-stream") == 4
        # and the minidelta writer composes on top of the foreign
        # checkpoint: append lands at v3
        t.write(
            spark.createDataFrame([(9, "foxtrot")], "k long, s string")
            .coalesce(1),
            mode="append",
        )
        assert t.read().count() == 5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_minidelta_reads_foreign_partitioned_log(spark):
    """r13: hive-partitioned FOREIGN log — partition values live in
    the log's partitionValues and the paths are hive-encoded (one
    value carries a space). The reader must restore the partition
    column (data files do not store it), decode the hive encoding,
    and prune at log level."""
    import os

    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        MiniDeltaTable,
    )

    src = os.path.join(
        os.path.dirname(__file__), "fixtures", "real_delta_partitioned"
    )
    tmp = tempfile.mkdtemp(prefix="real_delta_part_")
    try:
        dst = os.path.join(tmp, "t")
        shutil.copytree(src, dst)
        t = MiniDeltaTable(spark, dst)
        got = {(r.k, r.part_col) for r in t.read().collect()}
        assert got == {(10, "red"), (11, "red"), (20, "a b")}
        pruned = t.files_for({"part_col": "a b"})
        assert len(pruned) == 1 and "a%20b" in pruned[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
