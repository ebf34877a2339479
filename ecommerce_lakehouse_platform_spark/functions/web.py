"""URL canonicalization for web-corpus pipelines.

Dedup of crawled corpora starts with URL identity: the same page
arrives as ``HTTPS://Site.COM:443/a?utm_source=x&b=2&a=1#frag`` and
``https://site.com/a?a=1&b=2``. Canonicalization (lowercase scheme/
host, default-port strip, tracking-param removal, query-param sort,
fragment drop) collapses them before any content hashing runs.

Pure regexp/array built-ins — map-side at any scale, and every regex
sticks to character classes that behave identically under Java
regex and RE2, so the DuckDB oracle matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that identify a delivery, not a document
TRACKING_PREFIXES = ("utm_", "ref=", "gclid=", "fbclid=")


def _strip_fragment(url: Column) -> Column:
    return F.regexp_extract(url, "^([^#]*)", 1)


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(_strip_fragment(url), "^([A-Za-z]+)://", 1))


def url_host(url: Column) -> Column:
    hostport = F.regexp_extract(_strip_fragment(url), "^[A-Za-z]+://([^/?]+)", 1)
    return F.lower(F.regexp_extract(hostport, "^([^:]+)", 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(
        _strip_fragment(url), "^[A-Za-z]+://[^/?]+(/[^?]*)", 1
    )


def canonical_query(url: Column) -> Column:
    """Surviving query params, tracking-stripped and sorted; empty
    string when nothing survives."""
    query = F.regexp_extract(_strip_fragment(url), "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~sum(
            (p.startswith(pref).cast("int") for pref in TRACKING_PREFIXES),
            F.lit(0),
        ).cast("boolean"),
    )
    return F.array_join(F.array_sort(params), "&")


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercased scheme+host, default port stripped
    (443 for https, 80 for http; any other port kept), path as-is,
    tracking params dropped, remaining params sorted, fragment gone."""
    scheme = url_scheme(url)
    hostport = F.regexp_extract(_strip_fragment(url), "^[A-Za-z]+://([^/?]+)", 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = F.when(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    q = canonical_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        url_host(url),
        keep_port,
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
