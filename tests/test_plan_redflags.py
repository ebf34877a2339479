"""Global plan red-flag sweep: EVERY registered query's physical plan
is screened for the three patterns that kill a 100 TB run regardless
of correctness:

- ``CartesianProduct`` — an unbroadcast all-pairs join. Even one is a
  non-starter at scale (the legitimate crossJoins in the engine are
  against broadcast one-row aggregates or C-row centroid tables, which
  plan as BroadcastNestedLoopJoin, not CartesianProduct).
- ``BatchEvalPython`` / ``ArrowEvalPython`` — a per-row/expression
  Python UDF on the path. The engine's contract is zero Python UDFs;
  the only Python boundary is Arrow ``mapInPandas`` in the multimodal
  codec stages.
- ``MapInPandas`` outside the declared multimodal allowlist — any new
  query that silently routes a full scan through Python gets caught
  here instead of in a bench regression three rounds later.

The per-query plan-shape suites pin POSITIVE properties (broadcasts,
aggregate placement, exchange counts) for specific operators; this
sweep is the NEGATIVE screen that covers the whole registry, so a
future query can't reintroduce a scale hazard unnoticed.

Implementation note: building a plan requires calling the query
builder, which for the iterative operators (clusters, pagerank, label
propagation) executes their smoke-scale loop — that is acceptable
cost (~seconds each at sf0.001) and exactly what the rest of the
suite does.
"""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark import registry
from ecommerce_lakehouse_platform_spark.registry import QUERIES

from .conftest import SF_SMOKE

# The only queries allowed to cross the Arrow Python boundary: the
# multimodal codec stages, where the decode genuinely cannot be
# expressed relationally. Everything else must be pure JVM.
MAPINPANDAS_ALLOWED = {
    "ext_media_frames",  # the REAL RIFF/WAVE frame sampler (fake=False)
    "ext_media_phash_dedup",
    "ext_media_embed_topk",  # decode stage feeding the cosine top-k
    "ext_media_ppm_resize",  # the REAL netpbm codec path (fake=False)
}

ALL_QUERIES = sorted(QUERIES)


def _physical_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_plan_redflags(spark, name):
    plan = _physical_plan(spark, name)
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct (unbroadcast all-pairs join)")
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        flags.append("Python UDF node (BatchEvalPython/ArrowEvalPython)")
    if "MapInPandas" in plan and name not in MAPINPANDAS_ALLOWED:
        flags.append("MapInPandas outside the multimodal allowlist")
    assert not flags, f"{name}: {flags}\n{plan[:2000]}"


def test_allowlist_queries_exist():
    """A renamed multimodal query would silently shrink the allowlist
    into dead entries while the renamed query fails the sweep — keep
    the two in sync."""
    missing = MAPINPANDAS_ALLOWED - set(registry.QUERIES)
    assert not missing, sorted(missing)
