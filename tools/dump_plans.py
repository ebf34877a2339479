"""Dump ``.explain("formatted")`` for registry queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (the judge reads plan claims against these, it cannot run
Spark).

Usage:
    python tools/dump_plans.py --tag r13 --suffix before [q1 q2 ...]

With no query names, dumps every bench HEADLINE query. Plans are the
PRE-EXECUTION formatted plans (AdaptiveSparkPlan isFinalPlan=false) —
deterministic, no data touched, fast. Sink-writing queries
(bench.SINK_QUERIES) build real tables when their plan is *forced*;
here we only call explain on the returned frame, which for those
queries still runs their setup writes — they are skipped unless named
explicitly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from ecommerce_lakehouse_platform_spark import registry  # noqa: E402
from ecommerce_lakehouse_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    if args.queries:
        names = args.queries
    else:
        names = [
            n for n in bench.HEADLINE
            if n in registry.QUERIES and n not in bench.SINK_QUERIES
        ]
    for name in names:
        spark.catalog.clearCache()
        df = registry.QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"[plans] wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
