"""Runtime Bloom-filter join pruning: on a shuffle join with a
selective build side, Catalyst injects a bloom_filter_agg on the dim
side and a BloomFilterMightContain probe into the fact scan — rows
that cannot match are dropped BEFORE the shuffle. At 100 TB this is
the difference between shuffling the whole fact table and shuffling
the ~1% that survives the probe, without any manual semi-join.

Fixture sizes are far below the default creation/application
thresholds, so the test lowers them to prove the rewrite fires and
that it is result-invisible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture dims are tiny; drop the floor so the rewrite triggers
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    # force a shuffle join: bloom pruning is pointless under broadcast
    # (the broadcast hash IS the filter), so pin the large-large shape
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, fn):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        return fn()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _join(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_and_result_invisible(spark):
    def run():
        df = _join(spark)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "BloomFilterMightContain" in plan or "might_contain" in plan, plan
        return {r["o_orderpriority"]: r["n"] for r in df.collect()}

    pruned = _with_confs(spark, run)
    plain = {r["o_orderpriority"]: r["n"] for r in _join(spark).collect()}
    assert pruned == plain
