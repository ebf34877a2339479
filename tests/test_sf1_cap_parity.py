"""Cross-engine parity for the stop-shingle cap IN THE BINDING REGIME.

The five capped exact-shingle queries are oracle-green at sf0.001 and
sf0.01, but there the cap is the identity (floor 32 vs max df ≤ 25) —
those runs prove nothing about the cap arithmetic itself. This suite
re-runs the full Spark-vs-DuckDB differential against the sf1 probe
fixture (50k docs, max df 13,410, cap = ceil(0.005·n_docs) = 250
binding hard), so a drift between ``_cap_stop_shingles`` and
``ORACLE_SH_CAPPED`` — a GREATEST/CEIL mismatch, a different n_docs
base, an off-by-one on the HAVING bound — fails loudly instead of
hiding below the fixture scale.

Skipped when the fixture is absent (it is git-ignored; build with
``python tools/make_sf1.py``). Marked slow: ~25 min total on the
conftest local[8] session — run it when the cap code or the oracle
fragment changes, not per-commit.
"""

from __future__ import annotations

import os

import pytest

from ecommerce_lakehouse_platform_spark import registry

from .oracle_harness import compare

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".benchdata", "sf1")

CAPPED_QUERIES = [
    "ext_dedup_ngram_jaccard",
    "ext_dedup_containment",
    "ext_dedup_prefix_filter",
    "ext_dedup_clusters",
    "ext_dedup_keep_best",
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
    # the sf1 fixture is Spark-written: each table is a directory of
    # part files, unlike the driver's single-file sf0.* fixtures
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF1_DIR}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", CAPPED_QUERIES)
def test_capped_query_parity_where_cap_binds(spark, sf1_ddb, name):
    sdf = registry.QUERIES[name](spark, SF1_DIR)
    oracle_pdf = sf1_ddb.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, oracle_pdf, name)
    assert not problems, problems
    # the regime check: this corpus must actually exercise the cap
    # (a fixture regression back to low-df documents would silently
    # turn this suite into a second identity test). The expected cap
    # is DERIVED from the fixture itself — a hard-coded constant goes
    # stale if the fixture is regenerated at a different doc count.
    import math

    from ecommerce_lakehouse_platform_spark.operators import neardup as nd

    max_df, n_docs = sf1_ddb.execute(
        """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(t)-1),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
          FROM toks WHERE len(t) >= 3
        )
        SELECT MAX(cnt), (SELECT COUNT(DISTINCT doc_id) FROM sh)
        FROM (SELECT COUNT(*) AS cnt FROM sh GROUP BY s)
        """
    ).fetchone()
    cap = max(
        nd.MAX_DF_FLOOR,
        min(math.ceil(nd.MAX_DF_FRAC * n_docs), nd.MAX_DF_CEIL),
    )
    assert max_df > cap, (
        f"cap no longer binds on this fixture (max df {max_df} <= cap {cap})"
    )
