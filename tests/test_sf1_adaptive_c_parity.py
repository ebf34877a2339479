"""Cross-engine parity for the adaptive centroid count AT SCALE.

The two embedding near-dup queries are oracle-green at sf0.001/sf0.01,
but there the adaptive pick C = max(8, ceil(sqrt(n))) is at or near
the floor (n <= 200 embeddings -> C <= 15), so those runs barely
exercise the formula. This suite re-runs the full Spark-vs-DuckDB
differential against the sf1 probe fixture (20k embeddings ->
C = 142), where a drift between ``adaptive_n_centroids`` and the
oracle's row_number-capped centroid CTE — a GREATEST/CEIL mismatch, a
different count base, a divergent salted-md5 centroid order — changes
the bucketing and fails the hash loudly.

Same contract as tests/test_sf1_cap_parity.py: skipped when the
git-ignored fixture is absent (build with ``python tools/make_sf1.py``),
slow-marked (DuckDB replays ~4M 64-dim cosine folds per query).
"""

from __future__ import annotations

import math
import os

import pytest

from ecommerce_lakehouse_platform_spark import registry

from .oracle_harness import compare

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".benchdata", "sf1")

ADAPTIVE_QUERIES = [
    "ext_dedup_embedding",
    "ext_dedup_semantic_clusters",
]

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(SF1_DIR),
        reason="sf1 fixture not built (python tools/make_sf1.py)",
    ),
]


@pytest.fixture(scope="module")
def sf1_ddb():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF1_DIR}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ADAPTIVE_QUERIES)
def test_adaptive_c_parity_at_scale(spark, sf1_ddb, name):
    sdf = registry.QUERIES[name](spark, SF1_DIR)
    oracle_pdf = sf1_ddb.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, oracle_pdf, name)
    assert not problems, problems
    # regime check, derived from the fixture: the adaptive pick must be
    # meaningfully above the floor here, or this suite has regressed
    # into a second fixture-scale identity test
    from ecommerce_lakehouse_platform_spark.operators import neardup as nd

    n_vecs = sf1_ddb.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    expected_c = max(8, math.ceil(math.sqrt(n_vecs)))
    assert nd.adaptive_n_centroids(n_vecs) == expected_c
    assert expected_c >= 4 * 8, (
        f"fixture too small to exercise adaptive C (C={expected_c})"
    )
