"""Generate a synthetic sf1 fixture (~10x sf0.1) for the scaling
probe, inside the repo at .benchdata/sf1 (gitignored).

The driver ships sf{0.001,0.01,0.1}; the r4 verdict asks for one
sf1.0 probe showing <= linear growth on the most expensive headline
queries. This replicates sf0.1 10x with JOIN-CONSISTENT key shifts
(the same logical key domain gets the same shift in every table, so
orders still find their customer, lineitems their order/part/supplier,
events their user) and WITHOUT fabricating cross-copy duplicates:

- documents: copy 0 keeps the original text; copies 1-9 deterministically
  re-order each doc's tokens (sort by xxhash64(token, new doc_id)).
  Token/vocab statistics scale exactly 10x, but the copies are NOT
  near-duplicates of each other — naive text replication would grow
  every shingle's document frequency 10x and the candidate self-join
  quadratically, benchmarking an input artifact instead of the plan.
- embeddings: copies 1-9 get small deterministic per-dimension
  perturbations, so ANN/semantic-dedup candidates don't degenerate
  into 10-way exact ties.
- events.ts stays a nanos-since-epoch LONG (what the loader reads via
  nanosAsLong), written back as a plain INT64 column.

Run:  python tools/make_sf1.py   (~170 MB, local[32], <2 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ecommerce_lakehouse_platform_spark.session import get_spark  # noqa: E402
from ecommerce_lakehouse_platform_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata",
    "sf1",
)
COPIES = 10

# one shift per logical key domain — every table shifts the same key
# by the same amount, preserving referential integrity per copy
SHIFT = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "eventid": 10_000_000,
    "docid": 1_000_000,
    "vecid": 1_000_000,
}

# table -> {column: domain}
KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "custkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def replicate(df: DataFrame, shifts: dict[str, str]) -> DataFrame:
    out = df.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
    )
    for col, domain in shifts.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_i") * F.lit(SHIFT[domain])).cast("long")
        )
    return out


def main() -> None:
    spark = get_spark(
        app_name="make_sf1",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    for t in ("region", "nation"):  # fixed dimensions: single copy
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    for t, shifts in KEYS.items():
        df = replicate(load_table(spark, SRC, t), shifts)
        if t == "documents":
            # copies > 0: deterministic token re-order (keeps vocab and
            # length stats, kills cross-copy near-duplication)
            shuffled = F.array_join(
                F.transform(
                    F.array_sort(
                        F.transform(
                            F.split("text", " "),
                            lambda x: F.struct(
                                F.xxhash64(x, F.col("doc_id")).alias("h"),
                                x.alias("t"),
                            ),
                        )
                    ),
                    lambda s: s["t"],
                ),
                " ",
            )
            df = df.withColumn(
                "text", F.when(F.col("_i") == 0, F.col("text")).otherwise(shuffled)
            )
        if t == "embeddings":
            noised = F.transform(
                F.col("embedding"),
                lambda x, j: x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(1000))
                    - F.lit(500)
                ).cast("float")
                / F.lit(50000.0),
            )
            df = df.withColumn(
                "embedding",
                F.when(F.col("_i") == 0, F.col("embedding")).otherwise(noised),
            )
        df.drop("_i").repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    for t in list(KEYS) + ["region", "nation"]:
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n)


if __name__ == "__main__":
    main()
