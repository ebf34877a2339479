"""REGISTRY.md is generated (tools/registry_inventory.py); this pins
its key set against the live registry so a stale inventory fails the
suite instead of shipping documentation drift."""

from __future__ import annotations

import os
import re

from ecommerce_lakehouse_platform_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_md_matches_registry():
    with open(os.path.join(ROOT, "REGISTRY.md"), encoding="utf-8") as fh:
        text = fh.read()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.MULTILINE))
    registered = set(registry.QUERIES)
    missing = sorted(registered - listed)
    stale = sorted(listed - registered)
    assert not missing and not stale, (
        f"REGISTRY.md drift — regenerate with "
        f"`python tools/registry_inventory.py > REGISTRY.md` "
        f"(missing: {missing}, stale: {stale})"
    )
    m = re.search(r"^(\d+) registered queries", text.splitlines()[2])
    assert m and int(m.group(1)) == len(registered)


def test_pytest_only_tier_anchors_exist():
    """REGISTRY.md's pytest-only section lists library surface the
    external driver never checks (registry capacity) — each listed
    anchor must still exist, or the documentation claims coverage
    that quietly rotted away."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from registry_inventory import PYTEST_ONLY

    for _cap, mod, anchor in PYTEST_ONLY:
        assert os.path.exists(os.path.join(ROOT, mod)), mod
        test_file, _, test_name = anchor.partition("::")
        path = os.path.join(ROOT, test_file)
        assert os.path.exists(path), anchor
        with open(path, encoding="utf-8") as fh:
            assert f"def {test_name}(" in fh.read(), anchor


def test_pytest_only_tier_rendered():
    """The generated section must be present in REGISTRY.md with one
    row per PYTEST_ONLY entry."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from registry_inventory import PYTEST_ONLY

    with open(os.path.join(ROOT, "REGISTRY.md"), encoding="utf-8") as fh:
        text = fh.read()
    assert "## Pytest-only library surface" in text
    for _cap, _mod, anchor in PYTEST_ONLY:
        assert f"`{anchor}`" in text, anchor
