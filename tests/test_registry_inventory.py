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
