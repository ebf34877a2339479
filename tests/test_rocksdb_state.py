"""RocksDB state store provider: the production state backend for
large streaming state (state off-heap + incremental snapshot
checkpoints, vs the default HDFS-backed in-memory provider whose
state must fit the executor heap).

Results must be IDENTICAL under either provider — state storage is an
execution concern, not a semantics one. Runs the heaviest stateful
pipelines (custom sessionizer, streaming dedup) under RocksDB and
compares to their default-provider output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.plans.silver import silver_events
from ecommerce_lakehouse_platform_spark.streaming.dedup import (
    run_stream_dedup_bounded,
)
from ecommerce_lakehouse_platform_spark.streaming.stateful import (
    run_stateful_sessions_bounded,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture
def rocksdb_provider(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prev)


def _sessions(spark, sf_dir):
    ev = silver_events(load_table(spark, sf_dir, "events"))
    out = run_stateful_sessions_bounded(spark, ev, gap="30 minutes")
    return sorted(map(tuple, out.collect()))


def test_stateful_sessions_identical_under_rocksdb(spark, sf_dir):
    base = _sessions(spark, sf_dir)
    with_rocks = None
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    try:
        with_rocks = _sessions(spark, sf_dir)
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
    assert base, "expected sessions from the fixture"
    assert with_rocks == base


def test_stream_dedup_identical_under_rocksdb(spark, sf_dir, rocksdb_provider):
    ev = load_table(spark, sf_dir, "events").select("event_id")
    out = run_stream_dedup_bounded(spark, ev.unionAll(ev), ["event_id"])
    got = {r.event_id for r in out.collect()}
    want = {r.event_id for r in ev.distinct().collect()}
    assert got == want
