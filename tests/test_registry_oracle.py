"""Differential test: every registry query with an oracle must match
DuckDB exactly (row count, columns, order-insensitive values) — the
same gate the driver applies at sf0.01; we run sf0.001 for speed and
mark the sf0.01 run slow.
"""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark import registry

from .conftest import SF_CORRECTNESS, SF_SMOKE
from .oracle_harness import compare, run_oracle

ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_smoke(spark, name):
    sdf = registry.QUERIES[name](spark, SF_SMOKE)
    odf = run_oracle(registry.ORACLES[name], SF_SMOKE)
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_sf001(spark, name):
    sdf = registry.QUERIES[name](spark, SF_CORRECTNESS)
    odf = run_oracle(registry.ORACLES[name], SF_CORRECTNESS)
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)
