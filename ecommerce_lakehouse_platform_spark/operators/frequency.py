"""Frequent-item (heavy-hitter) detection at corpus scale.

Two-pass exact heavy hitters:

1. **Candidate pass** — per-partition Misra-Gries summaries with
   k = ⌈1/φ⌉ counters (``mapInPandas``, bounded memory regardless of
   key cardinality). Misra-Gries guarantees any item with global
   frequency ≥ φ·N survives in at least one partition's summary
   (pigeonhole over the partition it is locally ≥ φ·N_p in), so the
   union of the per-partition candidate sets is a SUPERSET of the true
   heavy hitters — never a miss.
2. **Verify pass** — exact count of candidate items only (broadcast
   semi-join → partial+final hash aggregate), filtered at the exact
   threshold ⌈φ·N⌉.

The output is therefore EXACT — identical to ``GROUP BY + HAVING`` —
while the aggregation state is bounded by |candidates| ≪ |distinct
keys|. That is the 100 TB rationale: a plain groupBy over a
heavy-tailed key column (URLs, n-grams, user agents) carries the full
key cardinality through the shuffle and spills; the Misra-Gries pass
carries at most k counters per partition and the verify shuffle only
moves rows whose key is a candidate.

``mapInPandas`` is the documented custom-operator escape hatch here
(per-partition imperative state the built-in operators can't
express); everything else stays JVM-side.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, item_col: str, k: int
) -> DataFrame:
    """Distinct candidate items from per-partition Misra-Gries
    summaries with ``k`` counters (bounded memory per task)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame({item_col: list(counters.keys())})

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, schema=f"{item_col} string"
    )


def heavy_hitters(
    df: DataFrame, item_col: str, phi: float
) -> DataFrame:
    """Exact items with frequency ≥ ⌈φ·N⌉ and their exact counts.

    Output: (item, item_count) — bit-identical to the plain
    ``GROUP BY ... HAVING count >= ceil(phi * N)`` formulation, which
    is exactly what the DuckDB oracle runs.
    """
    k = max(1, math.ceil(1.0 / phi))
    items = df.select(F.col(item_col).cast("string").alias("item"))
    candidates = misra_gries_candidates(items, "item", k).distinct()
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        items.join(F.broadcast(candidates), ["item"])
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_count"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("item_count") >= F.ceil(F.lit(phi) * F.col("_n")))
        .select("item", "item_count")
    )
