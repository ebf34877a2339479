"""Fail-fast data-quality gate.

Generic re-expression of the reference's ``run_dq_check``
(/root/reference/04_data_quality/04_data_quality_checks.py:17-34):
run a query that selects *bad* rows; any row → raise and abort the
pipeline. Pure filter+count — distributed, no collect of the full
failure set (only a bounded sample for the error message).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame


class DataQualityError(ValueError):
    """Raised when an expectation finds failing rows (fail-fast gate)."""


@dataclass
class CheckResult:
    name: str
    failures: int
    sample: list

    @property
    def passed(self) -> bool:
        return self.failures == 0


def expect(
    df: DataFrame,
    name: str,
    failure_predicate: Column,
    raise_on_failure: bool = True,
    sample_rows: int = 5,
) -> CheckResult:
    """Assert that no row matches ``failure_predicate``."""
    bad = df.filter(failure_predicate)
    n = bad.count()
    sample = bad.limit(sample_rows).collect() if n else []
    result = CheckResult(name=name, failures=n, sample=sample)
    if n and raise_on_failure:
        raise DataQualityError(
            f"DQ check '{name}' failed: {n} bad rows; sample={sample}"
        )
    return result
