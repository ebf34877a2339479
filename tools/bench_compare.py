"""Sentinel-normalized comparison of two bench artifacts.

Round-to-round bench deltas in this sandbox are dominated by ambient
load: between rounds 5 and 6 every comparable query drifted +21%
uniformly — including queries whose code did not change — and the raw
artifact could not distinguish that from a regression. bench.py now
records a frozen scan-aggregate sentinel per run (same timing
methodology as the headline queries, code never changes); dividing
each query's median by its run's sentinel cancels the drift, so the
NORMALIZED ratio is the number to read before calling a delta a
regression.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Accepts BENCH_r*.json (compact driver line) plus its sibling detail,
or BENCH_DETAIL.json files directly — anything carrying a
``queries`` map; ``sentinel_sec`` is used when both sides have one,
otherwise the tool falls back to raw ratios and says so.
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import sys


def load(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        text = fh.read().strip()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = json.loads(text.splitlines()[-1])
    if "queries" in doc:
        return doc
    # driver BENCH_r files keep only the compact parsed line plus a
    # ~2KB TAIL of the detail line: recover what per-query pairs the
    # tail retained (complete `"name": sec` pairs before "stddev";
    # the tail's first, cut-mid-name pair has no opening quote, so the
    # regex skips it). Partial by construction — the comparison runs
    # over the intersection and says how many pairs were recovered.
    parsed = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else {}
    tail = doc.get("tail", "")
    if '"stddev"' not in tail:
        # the retained tail starts AFTER the queries map ended — any
        # name:number pairs in it are stddevs / sentinel_series
        # samples, NOT medians; harvesting them would compare noise
        # against the other side's true medians
        raise SystemExit(
            f"{path}: tail retains no portion of the 'queries' map "
            "(no '\"stddev\"' separator) — cannot recover medians"
        )
    seg = tail.split('"stddev"')[0]
    pairs = re.findall(r'"([A-Za-z0-9_]+)": ([0-9][0-9.]*)', seg)
    queries = {
        k: float(v)
        for k, v in pairs
        if k
        not in (
            "metric",
            "value",
            "sf",
            "n_queries",
            "sentinel_sec",
            "sentinel_stddev",
            "pos",
            "sec",
        )
    }
    if not queries:
        raise SystemExit(f"{path}: no 'queries' map and no recoverable tail")
    print(
        f"NOTE: {path}: per-query data recovered from the truncated "
        f"tail ({len(queries)} pairs)",
        file=sys.stderr,
    )
    return {
        "queries": queries,
        "sentinel_sec": parsed.get("sentinel_sec"),
    }


def per_query_sentinels(doc: dict) -> dict[str, float] | None:
    """query -> intra-run sentinel sample, when the artifact carries a
    ``sentinel_series`` (bench.py samples the frozen probe at query
    positions through the run — ambient load swings WITHIN a run,
    e.g. page-cache writeback from sink queries, which the single
    end-of-run sentinel cannot timestamp). Positions index the
    queries map's key order, which json preserves.

    Each query uses the nearest PRECEDING sample (pos ≤ its own): a
    query's own side effects (the sink queries' writeback) can
    inflate the sample that FOLLOWS it, and dividing by that inflated
    sample would normalize a genuinely slower sink back to ~1.0× —
    the preceding sample is the pre-contamination ambient level. For
    sink queries also read the RAW column: bench.py's settle barrier
    keeps their neighbors clean, but their own cost is theirs."""
    series = doc.get("sentinel_series")
    if not series:
        return None
    names = list(doc["queries"])
    out = {}
    for i, q in enumerate(names):
        preceding = [s for s in series if s["pos"] <= i]
        if preceding:
            chosen = max(preceding, key=lambda s: s["pos"])
        else:  # no sample at-or-before: fall back to the earliest
            chosen = min(series, key=lambda s: s["pos"])
        out[q] = chosen["sec"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.5,
        help="flag queries whose normalized ratio exceeds this",
    )
    args = ap.parse_args()
    a, b = load(args.old), load(args.new)
    sa, sb = a.get("sentinel_sec"), b.get("sentinel_sec")
    normalized = bool(sa and sb)
    if not normalized:
        print(
            "NOTE: sentinel missing on one side — raw ratios only "
            f"(old={sa}, new={sb})",
            file=sys.stderr,
        )
    common = sorted(set(a["queries"]) & set(b["queries"]))
    if not common:
        raise SystemExit("no common queries between the two artifacts")
    drift = (sb / sa) if normalized else 1.0
    # per-query ambient samples beat the global scalar when present
    # on both sides: each query divides by the sentinel measured
    # nearest to ITS position in its own run
    pq_a, pq_b = per_query_sentinels(a), per_query_sentinels(b)
    per_query = bool(pq_a and pq_b)
    if per_query:
        print(
            "NOTE: both artifacts carry sentinel_series — normalizing "
            "each query by its nearest intra-run sample",
            file=sys.stderr,
        )
    rows = []
    for q in common:
        va, vb = a["queries"][q], b["queries"][q]
        raw = vb / va if va else float("inf")
        if per_query and q in pq_a and q in pq_b and pq_a[q] and pq_b[q]:
            norm = raw / ((pq_b[q] / pq_a[q]))
        else:
            norm = raw / drift
        rows.append((q, va, vb, raw, norm))
    rows.sort(key=lambda r: -r[4])
    print(
        f"common queries: {len(common)}"
        + (
            f"; sentinel old={sa:.3f}s new={sb:.3f}s -> ambient drift "
            f"x{drift:.2f} (divided out of the normalized column)"
            if normalized
            else ""
        )
    )
    print(f"{'query':<34} {'old_s':>8} {'new_s':>8} {'raw':>6} {'norm':>6}")
    for q, va, vb, raw, norm in rows:
        flag = "  <-- check" if norm > args.threshold else ""
        print(f"{q:<34} {va:>8.3f} {vb:>8.3f} {raw:>6.2f} {norm:>6.2f}{flag}")
    raws = [r[3] for r in rows]
    norms = [r[4] for r in rows]
    print(
        f"\nmedian raw x{statistics.median(raws):.2f}; "
        f"median normalized x{statistics.median(norms):.2f}; "
        f"flagged (> x{args.threshold}): "
        f"{sum(1 for n in norms if n > args.threshold)}"
    )


if __name__ == "__main__":
    main()
