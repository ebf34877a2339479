"""Generate the synthesized events.csv / sessions.csv sample fixtures
for the reference-native pipeline tests.

The reference repo ships 5 of its 7 raw CSVs; events.csv was never
committed and sessions.csv is blob-stripped
(/root/reference/.MISSING_LARGE_BLOBS:1), so the native
events/sessions silver models and the gold models they feed
(product_funnel event side, session_metrics, customer_360 activity)
could only be asserted structurally on zero rows. These fixtures match
the bronze schemas recovered from the silver selects
(/root/reference/02_silver/02_silver_transform.py:82-104,241-250) and
deliberately exercise every cleaning rule:

- a row with a NULL event_id (dropped by the null-PK filter);
- an exactly-duplicated event row (keep-latest dedupe collapses it;
  the duplicate is IDENTICAL so the surviving row is value-
  deterministic regardless of the tiebreak);
- an event_type with surrounding whitespace (trim);
- events in a session absent from sessions.csv (UNKNOWN attr path);
- sessions with NULL customer_id (UNKNOWN customer path);
- sessions with no events (absent from session_metrics by
  construction);
- page_view events with NULL product_id (excluded from
  product_metrics by its final product_id filter);
- a purchase with NULL amount_usd (skipped by SUM in both engines).

Deterministic: fixed seed, fixed timestamps; the CSVs are committed,
this script only documents/regenerates them.

Usage: python tools/make_reference_native_fixtures.py
"""

from __future__ import annotations

import os
import random

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "reference_native",
)

DEVICES = ["desktop", "mobile", "tablet"]
SOURCES = ["organic", "ads", "email"]
COUNTRIES = ["US", "FR", "DE", '" PL "']  # quoted whitespace → trim


def _ts(base_min: int, sec: int = 0) -> str:
    total = base_min * 60 + sec
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    return f"2025-03-01T{8 + h:02d}:{m:02d}:{s:02d}"


def main() -> None:
    rng = random.Random(42)
    os.makedirs(OUT, exist_ok=True)

    sessions = []
    for i in range(60):
        sid = 1001 + i
        cust = "" if i % 20 == 19 else str((i % 25) + 1)  # some NULLs
        sessions.append(
            (
                str(sid),
                cust,
                _ts(i),
                DEVICES[i % 3],
                SOURCES[i % 3],
                COUNTRIES[i % 4],
            )
        )

    events = []
    eid = 5001
    for i in range(57):  # sessions 1058-1060 get no events
        sid = 1001 + i
        n_ev = 3 + rng.randrange(5)
        for k in range(n_ev):
            etype = (
                "page_view"
                if k < n_ev - 2
                else ("add_to_cart" if k == n_ev - 2 else "purchase")
            )
            # some page views carry no product (landing pages)
            pid = "" if (etype == "page_view" and k == 0 and i % 5 == 0) else str(
                (i * 7 + k) % 50 + 1
            )
            qty = str(rng.randrange(1, 4)) if etype != "page_view" else ""
            cart = str(k) if etype == "add_to_cart" else ""
            pay = "card" if etype == "purchase" else ""
            disc = "0.05" if etype == "purchase" and i % 3 == 0 else ""
            amt = (
                f"{20 + (i * 13 + k) % 180}.{(i * 7) % 100:02d}"
                if etype == "purchase"
                else ""
            )
            events.append(
                (str(eid), str(sid), _ts(i, 30 * (k + 1)), etype, pid,
                 qty, cart, pay, disc, amt)
            )
            eid += 1

    # --- edge rows ---
    # NULL event_id → dropped by the null-PK filter
    events.append(("", "1001", _ts(0, 45), "page_view", "3", "", "", "", "", ""))
    # exact duplicate of an existing row → dedupe keeps one
    events.append(events[0])
    # whitespace event_type → trim makes it a purchase
    events.append(
        ("9101", "1002", _ts(1, 50), '"  purchase  "', "7", "1", "", "card", "", "33.50")
    )
    # session absent from sessions.csv → UNKNOWN attributes
    events.append(("9102", "9999", _ts(2, 10), "page_view", "9", "", "", "", "", ""))
    events.append(
        ("9103", "9999", _ts(2, 40), "purchase", "9", "1", "", "card", "", "12.00")
    )
    # purchase with NULL amount_usd → skipped by SUM in both engines
    events.append(
        ("9104", "1003", _ts(2, 55), "purchase", "11", "1", "", "card", "", "")
    )

    with open(os.path.join(OUT, "sessions.csv"), "w") as f:
        f.write("session_id,customer_id,start_time,device,source,country\n")
        for row in sessions:
            f.write(",".join(row) + "\n")
    with open(os.path.join(OUT, "events.csv"), "w") as f:
        f.write(
            "event_id,session_id,timestamp,event_type,product_id,qty,"
            "cart_size,payment,discount_pct,amount_usd\n"
        )
        for row in events:
            f.write(",".join(row) + "\n")
    print(f"wrote {len(sessions)} sessions, {len(events)} event rows to {OUT}")


if __name__ == "__main__":
    main()
