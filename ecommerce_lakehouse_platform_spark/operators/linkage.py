"""Record linkage: blocked fuzzy join (approximate entity matching).

The textual cousin of the MinHash near-dup pipeline: find record
pairs that refer to the same entity despite small string differences.
All-pairs edit distance is O(n²) and unshippable at scale; the
standard shape is block → pair within block → refine:

1. a cheap BLOCKING key (here: an exact attribute; in general a
   phonetic code, prefix, or LSH bucket) bounds the candidate set —
   only rows sharing a block ever meet;
2. candidate pairs form via an EQUI-join on the block key (hash join,
   never a cross join);
3. an exact ``levenshtein`` refine keeps pairs within the distance
   budget. Verified bit-compatible between Spark and DuckDB, so the
   whole operator is oracle-checkable.

Per-block pair count is quadratic in block size — the operator's
scale knob is the blocking key's selectivity, same contract as
LSH banding (operators/neardup.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_join"]


def blocked_fuzzy_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_distance: int = 1,
) -> DataFrame:
    """Self-linkage: pairs of rows sharing ``block_cols`` whose
    ``text_col`` values are within ``max_distance`` edits. Returns
    (id_a, id_b, text_a, text_b, distance) with id_a < id_b."""
    cols = [id_col, text_col, *block_cols]
    a = df.select(*cols).alias("a")
    b = df.select(*cols).alias("b")
    on: Column = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        on = on & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    dist = F.levenshtein(F.col(f"a.{text_col}"), F.col(f"b.{text_col}"))
    return (
        a.join(b, on)
        .filter(dist <= max_distance)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{text_col}").alias("text_a"),
            F.col(f"b.{text_col}").alias("text_b"),
            dist.alias("distance"),
        )
    )
