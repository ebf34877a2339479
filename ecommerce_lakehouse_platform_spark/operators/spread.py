"""Scale-adaptive parallelism floor for scan-rooted frames.

The compute-dense operators in this package (centroid scoring, PQ/SQ8
encoding, co-moment expansion, feature extraction) apply expensive
per-row projections directly above a parquet scan. A scan's
parallelism is bounded by its file/row-group layout, NOT by the data's
compute density: a single-row-group file arrives as ONE partition, and
everything above it runs on one core while the rest of the cluster
idles (the r13 profile measured 2.5 s single-task stages on frames
whose work parallelizes trivially).

``spread_small`` repartitions such a frame to the default parallelism
only when its total input size is provably tiny — small enough that
the inserted exchange is noise by the same measurement that justifies
it. Large inputs (whose scans are already parallel, and where an extra
full-corpus exchange would be a real cost) pass through untouched, so
the floor is scale-adaptive rather than tuned for either local mode or
a cluster: it self-disables exactly when it would start to cost.

Contrast ``neardup._spread``, which spreads UNCONDITIONALLY before
shingle explosion — correct there because the explode multiplies rows
~100× at any scale, so pre-spreading the compact input is the scale
move too. This helper is for the non-multiplying maps where the
unconditional form would be wrong at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "provably tiny": below this total input size the repartition's
# exchange moves less than one healthy shuffle partition per core and
# is unmeasurable next to the compute it parallelizes. Inputs at or
# past it keep their native scan parallelism.
SPREAD_MAX_INPUT_BYTES = 256 << 20


def spread_small(
    df: DataFrame, key_col: str, max_bytes: int = SPREAD_MAX_INPUT_BYTES
) -> DataFrame:
    """Hash-repartition ``df`` on ``key_col`` to the default
    parallelism iff its input files total under ``max_bytes``.

    Only meaningful for scan-rooted frames (``inputFiles`` is the
    evidence source); frames without resolvable local input files
    (in-memory test relations, non-file sources) pass through
    unchanged. Hash repartition is deterministic under retries, so
    the spread is safe for the exactly-reproducible operators that
    call it.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    total = 0
    for f in files:
        path = f.removeprefix("file:")
        try:
            total += os.path.getsize(path)
        except OSError:
            return df
    if total >= max_bytes:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, F.col(key_col))
