"""Staleness ledger over the driver's CORRECTNESS_r*.json artifacts.

The external driver re-checks only the first 50 registered queries
per round (the driver window), so the registry rotates the window
each round: changed/new queries first, then the queries whose newest
external green row is oldest. That policy lives in the
``_DRIVER_WINDOW`` comment in registry.py — this tool makes it
auditable: parse every recorded round, print each query's newest
external green row, and flag

- queries NEVER externally green (must be in the current window:
  first row now or never);
- queries whose newest green row is stale (displaced repeatedly);
- window slots spent on queries with a fresh green row (wasted
  re-checks, unless they are deliberate canaries or changed code).

A "green" row = rows+schema matched and the value hash matched when
an oracle existed (``err: no_oracle`` rows are the driver's weaker
rows-only check — counted separately, shown as ``rows-only``).

Usage: python tools/staleness_ledger.py [--repo-root PATH]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def load_rounds(root: str) -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def entry_status(v: dict) -> str:
    """'green' | 'rows-only' | 'red' for one driver record."""
    if v.get("err") == "no_oracle":
        return "rows-only" if v.get("spark_rows") is not None else "red"
    ok = (
        v.get("rows_match") is True
        and v.get("schema_match") is True
        and v.get("hash_match") is not False
        and not v.get("err")
    )
    return "green" if ok else "red"


def newest_green(rounds: dict[int, dict]) -> dict[str, tuple[int, str]]:
    """query -> (round, status) of its newest non-red external row.

    Hash-verified ``green`` rows are never masked by a later weaker
    ``rows-only`` row: if a query was ever value-verified, the ledger
    reports its newest GREEN round (a later no-oracle row proves less,
    not more); ``rows-only`` is reported only for queries that have
    never had a hash-verified row.
    """
    newest: dict[str, tuple[int, str]] = {}
    for rnd in sorted(rounds):
        for name, v in rounds[rnd].items():
            st = entry_status(v)
            if st == "red":
                continue
            if st == "rows-only" and newest.get(name, (0, ""))[1] == "green":
                continue
            newest[name] = (rnd, st)
    return newest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repo-root",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    args = ap.parse_args()

    sys.path.insert(0, args.repo_root)
    from ecommerce_lakehouse_platform_spark import registry

    rounds = load_rounds(args.repo_root)
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    newest = newest_green(rounds)
    latest_round = max(rounds)
    window = list(registry._DRIVER_WINDOW)

    by_round: dict[object, list[str]] = {}
    for name in sorted(registry.QUERIES):
        rnd = newest.get(name, (None, "never"))[0]
        by_round.setdefault(rnd, []).append(name)

    print(f"rounds recorded: {sorted(rounds)}; registry: "
          f"{len(registry.QUERIES)} queries; window: {len(window)}")
    for rnd in sorted(by_round, key=lambda r: (r is not None, r)):
        names = by_round[rnd]
        label = "NEVER GREEN" if rnd is None else f"newest green r{rnd}"
        print(f"\n{label} ({len(names)}):")
        for n in names:
            tag = " [in-window]" if n in window else ""
            weak = (
                " (rows-only)"
                if newest.get(n, (None, ""))[1] == "rows-only"
                else ""
            )
            print(f"  {n}{weak}{tag}")

    # invariant: a query with no external row must be in the window
    uncovered = [
        n for n in registry.QUERIES if n not in newest and n not in window
    ]
    if uncovered:
        print(f"\nVIOLATION — never-green and not in window: {uncovered}")
        return 2
    stale_cut = latest_round - 2
    stale_out = [
        n
        for n, (rnd, _) in newest.items()
        if n in registry.QUERIES and rnd < stale_cut and n not in window
    ]
    if stale_out:
        print(
            f"\nNOTE — newest green older than r{stale_cut} and not in the "
            f"window (displaced again): {sorted(stale_out)}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
