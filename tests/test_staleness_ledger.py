"""Rotation-policy invariants over the recorded driver artifacts.

The external driver only re-checks the first 50 registered queries per
round, so union coverage across rounds is a real obligation the
window rotation must keep: a query with NO external green row ever
must be sitting in the current window (its first row happens this
round or never). tools/staleness_ledger.py prints the full ledger;
this test pins the invariant so a window edit can't orphan a query.
"""

from __future__ import annotations

import os
import sys

import pytest

from ecommerce_lakehouse_platform_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from staleness_ledger import load_rounds, newest_green  # noqa: E402


@pytest.fixture(scope="module")
def ledger():
    rounds = load_rounds(ROOT)
    if not rounds:
        pytest.skip("no CORRECTNESS_r*.json artifacts recorded yet")
    return newest_green(rounds)


def test_every_query_covered_or_windowed(ledger):
    window = set(registry._DRIVER_WINDOW)
    orphaned = [
        n for n in registry.QUERIES if n not in ledger and n not in window
    ]
    assert not orphaned, (
        "queries with no external green row ever that are ALSO outside the "
        f"current driver window (they can never get one): {orphaned}"
    )


def test_staleness_bound_enforced(ledger):
    """Pin the rotation policy's freshness bound: after the CURRENT
    round's window is checked, no registered query's newest external
    green row may be older than (current round − 3). Enforced as:
    every query whose newest green row would violate the bound must
    be IN the current window (so this round's driver run refreshes
    it). A window edit that silently lets coverage age past the bound
    fails here instead of surfacing rounds later in a verdict."""
    import glob
    import re

    recorded = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    ]
    current_round = max(recorded) + 1  # the round this window feeds
    bound = current_round - 3
    window = set(registry._DRIVER_WINDOW)
    too_stale = sorted(
        name
        for name, (rnd, _status) in ledger.items()
        if name in registry.QUERIES and rnd < bound and name not in window
    )
    assert not too_stale, (
        f"queries whose newest external green row is older than r{bound} "
        f"(bound: current round {current_round} − 3) and NOT in the "
        f"current driver window: {too_stale} — rotate them in"
    )


def test_window_names_are_registered_and_unique():
    window = list(registry._DRIVER_WINDOW)
    assert len(window) == len(set(window)), "duplicate window entries"
    missing = [n for n in window if n not in registry.QUERIES]
    assert not missing, f"window names not registered: {missing}"


def test_rows_only_never_masks_green():
    """A later weaker rows-only row (err=no_oracle) must not overwrite
    a query's hash-verified green round — the rotation would then
    under-prioritize re-windowing the query whose VALUE verification
    is actually stale."""
    rounds = {
        1: {"q": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "spark_rows": 5, "err": None}},
        2: {"q": {"rows_match": None, "schema_match": None,
                  "hash_match": None, "spark_rows": 5,
                  "err": "no_oracle"},
            "p": {"rows_match": None, "schema_match": None,
                  "hash_match": None, "spark_rows": 3,
                  "err": "no_oracle"}},
        3: {"p": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "spark_rows": 3, "err": None}},
    }
    got = newest_green(rounds)
    assert got["q"] == (1, "green")  # not masked by r2 rows-only
    assert got["p"] == (3, "green")  # green upgrades rows-only


def test_ledger_statuses_parse(ledger):
    """Every recorded non-red row parses to a known status and a
    recorded round number — guards the ledger tool itself against a
    driver artifact format drift."""
    for name, (rnd, status) in ledger.items():
        assert isinstance(rnd, int) and rnd >= 1
        assert status in ("green", "rows-only")


def test_plan_next_window_forced_and_fill():
    """plan_next_window: the forced set is exactly the keys whose
    projected newest green would sit BELOW the tripwire bound when
    the next window is staged (never-green first), the fill takes the
    oldest projected greens, and a key inside the current window is
    projected green THIS round (so it is never forced next round)."""
    from staleness_ledger import plan_next_window

    queries = ["never", "old", "edge", "fresh", "windowed"]
    window = ["windowed", "fresh"]
    # latest recorded round = 9 → current window runs in r10, planning
    # the r11 window: breach bound at r11 is newest < 8
    newest = {
        "old": (7, "green"),     # r7 → below bound at r11 → forced
        "edge": (8, "green"),    # r8 → AT the bound at r11 → fill
        "fresh": (9, "green"),
        "windowed": (6, "green"),  # stale but in current window → r10
    }
    # "never" has no green row and sits OUTSIDE the current window →
    # it leads the forced list
    forced, fill = plan_next_window(newest, queries, window, 9)
    assert forced == ["never", "old"]
    # 2 slots, both consumed by the forced set → no fill
    assert fill == []
    # wider window (4 slots) that now CONTAINS "old": it projects
    # green r10 and drops out of forced; fill is oldest-first (edge
    # r8 before windowed/fresh/old at r10)
    forced2, fill2 = plan_next_window(
        newest, queries, window + ["old", "never"], 9
    )
    assert forced2 == []
    assert fill2[0] == "edge"


def test_plan_next_window_overflow_detection():
    """When the forced set alone exceeds the window capacity, the
    planner must surface it (the caller exits 2) rather than silently
    truncating the must-carry list."""
    from staleness_ledger import plan_next_window

    queries = [f"q{i}" for i in range(6)]
    window = ["q0", "q1"]  # capacity 2
    # four out-of-window keys all at the breach bound next round
    newest = {
        "q0": (9, "green"),
        "q1": (9, "green"),
        "q2": (7, "green"),
        "q3": (7, "green"),
        "q4": (7, "green"),
        "q5": (7, "green"),
    }
    forced, fill = plan_next_window(newest, queries, window, 9)
    assert forced == ["q2", "q3", "q4", "q5"]
    assert len(forced) > len(window), "overflow must be visible"
    assert fill == []
