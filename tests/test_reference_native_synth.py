"""Reference-native pipeline with the synthesized events/sessions
sample CSVs: the two sources the reference repo snapshot does not ship
(events.csv never committed, sessions.csv blob-stripped —
/root/reference/.MISSING_LARGE_BLOBS:1). tests/test_reference_native.py
keeps asserting the honest zero-row behavior on the real snapshot;
THIS module value-checks the events/sessions silver models and the
gold models they feed against a DuckDB twin, so the native
session/product-funnel path is no longer structurally-only."""

from __future__ import annotations

import os

import duckdb
import pytest

from ecommerce_lakehouse_platform_spark.plans.reference_native import (
    run_reference_native,
)

from .oracle_harness import compare

REF_RAW = "/root/reference/assets/raw_data_files"
FIXTURES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "reference_native"
)

# raw fixture rows: 290 total; 1 null event_id, 1 exact duplicate
EXPECTED_EVENTS_CLEAN = 288
EXPECTED_SESSIONS_CLEAN = 60


@pytest.fixture(scope="module")
def merged_raw(tmp_path_factory):
    """One raw_dir holding the reference's 5 shipped CSVs plus the two
    synthesized ones (symlinks; /root/reference stays read-only)."""
    d = tmp_path_factory.mktemp("ref_raw_merged")
    for fname in os.listdir(REF_RAW):
        os.symlink(os.path.join(REF_RAW, fname), d / fname)
    for fname in ("events.csv", "sessions.csv"):
        os.symlink(os.path.join(FIXTURES, fname), d / fname)
    return str(d)


@pytest.fixture(scope="module")
def ref_result(spark, merged_raw):
    """One pipeline execution shared by every test in the module —
    raise_on_dq_failure exercises the fail-fast gate on the same run
    the value checks read (a second full run would add wall-time, not
    coverage)."""
    return run_reference_native(
        spark, merged_raw, as_of="2026-01-01", raise_on_dq_failure=True
    )


@pytest.fixture(scope="module")
def ref_run(ref_result):
    return ref_result[0]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(
        f"""
        CREATE VIEW ev_raw AS SELECT * FROM read_csv(
          '{FIXTURES}/events.csv', header=true, columns={{
            'event_id':'BIGINT','session_id':'BIGINT','timestamp':'TIMESTAMP',
            'event_type':'VARCHAR','product_id':'BIGINT','qty':'INT',
            'cart_size':'INT','payment':'VARCHAR','discount_pct':'DOUBLE',
            'amount_usd':'DOUBLE'}})
        """
    )
    con.sql(
        f"""
        CREATE VIEW sess_raw AS SELECT * FROM read_csv(
          '{FIXTURES}/sessions.csv', header=true, columns={{
            'session_id':'BIGINT','customer_id':'BIGINT',
            'start_time':'TIMESTAMP','device':'VARCHAR','source':'VARCHAR',
            'country':'VARCHAR'}})
        """
    )
    # twin of ref_events_clean: typed projection + trim + null-PK
    # filter + keep-latest dedupe (the only duplicate is an identical
    # row, so DISTINCT reproduces it value-exactly)
    con.sql(
        """
        CREATE VIEW ev AS
        SELECT DISTINCT
          CAST(event_id AS VARCHAR) AS event_id,
          CAST(session_id AS VARCHAR) AS session_id,
          timestamp AS event_ts,
          TRIM(event_type) AS event_type,
          CAST(product_id AS VARCHAR) AS product_id,
          amount_usd,
          CAST(timestamp AS DATE) AS event_date
        FROM ev_raw WHERE event_id IS NOT NULL
        """
    )
    con.sql(
        """
        CREATE VIEW sess AS
        SELECT CAST(session_id AS VARCHAR) AS session_id,
               CAST(customer_id AS VARCHAR) AS customer_id,
               start_time AS session_start_ts_sessions,
               TRIM(device) AS device, TRIM(source) AS source,
               TRIM(country) AS country
        FROM sess_raw
        """
    )
    yield con
    con.close()


def test_silver_counts_with_synth_sources(ref_run):
    assert ref_run["events_clean"].count() == EXPECTED_EVENTS_CLEAN
    assert ref_run["sessions_clean"].count() == EXPECTED_SESSIONS_CLEAN
    # cleaning rules actually fired
    ev = ref_run["events_clean"]
    assert ev.filter("event_id IS NULL").count() == 0
    assert ev.filter("event_id = '9101' AND event_type = 'purchase'").count() == 1


def test_session_metrics_values_match_duckdb_twin(ref_run, ddb):
    """Full-value differential of the native session_metrics gold —
    03_gold_aggregate.py:163-211 semantics — including the UNKNOWN
    coalesces, the events-vs-sessions start coalesce, the truncated
    epoch-second duration, and the DECIMAL-routed purchase revenue."""
    oracle = ddb.sql(
        """
        WITH agg AS (
          SELECT session_id,
            MIN(event_ts) AS ev_start,
            MAX(event_ts) AS session_end_ts,
            COUNT(event_id) AS total_events,
            MIN(event_date) AS session_date,
            CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                     THEN amount_usd ELSE 0.0 END AS DECIMAL(30,6)))
                 AS DOUBLE) AS session_revenue,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS INT) AS has_purchased
          FROM ev GROUP BY session_id
        )
        SELECT a.session_id,
          COALESCE(s.customer_id, 'UNKNOWN') AS customer_id,
          a.session_date,
          COALESCE(a.ev_start, s.session_start_ts_sessions) AS session_start_ts,
          a.session_end_ts,
          CAST(FLOOR(epoch(a.session_end_ts)) AS BIGINT)
            - CAST(FLOOR(epoch(COALESCE(a.ev_start, s.session_start_ts_sessions)))
                   AS BIGINT) AS session_duration_sec,
          a.total_events,
          COALESCE(s.device, 'UNKNOWN') AS device,
          COALESCE(s.source, 'UNKNOWN') AS source,
          COALESCE(s.country, 'UNKNOWN') AS country,
          a.session_revenue,
          a.has_purchased
        FROM agg a LEFT JOIN sess s USING (session_id)
        WHERE (CAST(FLOOR(epoch(a.session_end_ts)) AS BIGINT)
               - CAST(FLOOR(epoch(COALESCE(a.ev_start,
                       s.session_start_ts_sessions))) AS BIGINT)) >= 0
        """
    ).df()
    problems = compare(ref_run["session_metrics"], oracle, "session_metrics")
    assert not problems, problems
    assert len(oracle) > 0


def test_product_funnel_event_side_matches_duckdb_twin(ref_run, ddb):
    """The event-side columns of product_metrics/product_funnel
    (view_count, cart_count per event_date × product) are determined
    by events alone, so they are value-checkable without replicating
    the order_items composite-key dedupe tiebreak. Compare all rows
    with any event activity."""
    oracle = ddb.sql(
        """
        SELECT event_date, product_id,
          CAST(SUM(CASE WHEN event_type = 'page_view' THEN 1 ELSE 0 END)
               AS INT) AS view_count,
          CAST(SUM(CASE WHEN event_type = 'add_to_cart' THEN 1 ELSE 0 END)
               AS INT) AS cart_count
        FROM ev
        WHERE product_id IS NOT NULL
        GROUP BY 1, 2
        HAVING view_count > 0 OR cart_count > 0
        """
    ).df()
    got = (
        ref_run["product_metrics"]
        .filter("view_count > 0 OR cart_count > 0")
        .select("event_date", "product_id", "view_count", "cart_count")
    )
    problems = compare(got, oracle, "product_metrics_event_side")
    assert not problems, problems
    assert len(oracle) > 0


def test_customer_360_activity_from_synth_sessions(ref_run):
    """customer_360 now carries real activity: customers with sessions
    get revenue/order/session rollups; the zero-session path keeps the
    NULL-AOV convention."""
    c360 = ref_run["customer_360"]
    active = c360.filter("total_sessions > 0")
    assert active.count() > 0
    assert active.filter("customer_total_revenue > 0").count() > 0
    idle = c360.filter("total_sessions = 0").first()
    assert idle.customer_total_revenue == 0.0
    assert idle.average_order_value is None


def test_dq_gate_passes_with_synth_sources(ref_result):
    checks = ref_result[1]
    assert checks and all(c.passed for c in checks)
