"""Interval (range) join — points matched to covering time intervals.

Spark executes a raw inequality join (``p.ts BETWEEN i.start AND
i.end``) as BroadcastNestedLoopJoin — O(|points| × |intervals|) per
key and a broadcast of a whole side; at fact-scale that is the plan
that never finishes. This operator makes the range join an EQUI-join:

1. bucket time into fixed windows of ``bucket_width_sec``;
2. each interval emits one row per bucket it overlaps (bounded fan-out
   when interval length ≲ bucket width — pick the width accordingly);
3. each point maps to exactly one bucket (map-side, no fan-out);
4. hash equi-join on (keys…, bucket), then the exact
   ``start <= point < end`` refinement filter.

Every matching (point, interval) pair meets in exactly one bucket —
the point's — so no post-join dedupe is needed. The join shuffles on
(keys, bucket), which also spreads hot keys across buckets: a
key-only shuffle would concentrate a hot user on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_sec: int,
) -> DataFrame:
    """Inner-join every point to each interval covering it:
    ``start <= point < end`` within equal ``keys``. Output carries all
    columns of both inputs (names must not collide apart from keys).
    """
    width_us = bucket_width_sec * _US
    p_us = F.unix_micros(F.col(point_ts))
    s_us = F.unix_micros(F.col(start_ts))
    e_us = F.unix_micros(F.col(end_ts))

    # degenerate (empty) intervals match nothing; dropping them first
    # also keeps Spark's sequence() from generating a DESCENDING
    # bucket range when end < start
    intervals = intervals.filter(e_us > s_us)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(s_us / width_us),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into that bucket
                F.floor((e_us - 1) / width_us),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(p_us / width_us))
    return (
        pt.join(iv, [*keys, "_bucket"])
        .filter((p_us >= s_us) & (p_us < e_us))
        .drop("_bucket")
    )
