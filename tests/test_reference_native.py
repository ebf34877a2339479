"""Reference-native mode: the engine runs the reference's OWN raw CSV
sample data (read-only at /root/reference) end-to-end — bronze ingest
with explicit schemas, the seven silver models, the four gold models,
and the four DQ-gate checks."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark.plans.reference_native import (
    run_reference_dashboards,
    run_reference_native,
)

RAW = "/root/reference/assets/raw_data_files"

# Row counts of the shipped sample data (BASELINE.md); the silver
# models only drop null-PK rows and duplicate keys. The sample's
# order_items carries 110 duplicate (order_id, product_id) keys
# (59,163 raw), which the reference's composite-key keep-latest
# dedupe collapses exactly as we do.
EXPECTED_SILVER = {
    "customers_clean": 20_000,
    "orders_clean": 33_580,
    "order_items_clean": 59_053,
    "products_clean": 1_197,
    "reviews_clean": 10_780,
    "events_clean": 0,  # events.csv absent from the repo snapshot
    "sessions_clean": 0,  # sessions.csv stripped as a large blob
}


@pytest.fixture(scope="module")
def ref_run(spark):
    return run_reference_native(spark, RAW, as_of="2026-01-01")


def test_silver_counts_match_sample_data(ref_run):
    tables, _ = ref_run
    got = {name: tables[name].count() for name in EXPECTED_SILVER}
    assert got == EXPECTED_SILVER


def test_gold_models_materialize_with_native_schema(ref_run):
    tables, _ = ref_run
    pm = tables["product_metrics"]
    assert set(pm.columns) == {
        "event_date", "product_id", "product_name", "category", "view_count",
        "cart_count", "purchase_count", "total_revenue", "avg_rating",
        "review_count",
    }
    # events are absent, so metrics come from the sales side of the
    # full outer join with zero-coalesced view/cart counts
    assert pm.count() > 0
    c360 = tables["customer_360"]
    assert c360.count() == 20_000
    row = c360.filter("total_sessions = 0").first()
    assert row.customer_total_revenue == 0.0
    assert row.average_order_value is None  # NULL-AOV convention


def test_dq_gate_passes_on_sample_data(ref_run):
    _, checks = ref_run
    assert [c.failures for c in checks] == [0, 0, 0, 0]
    assert all(c.passed for c in checks)


def test_reference_dashboards_run_with_named_params(spark, ref_run):
    tables, _ = ref_run
    dashes = run_reference_dashboards(
        spark, tables, start_date="2025-01-01", end_date="2025-12-31"
    )
    pp = dashes["product_performance"]
    rows = pp.collect()
    # sales-side metrics exist in the sample window; views are zero
    # (events.csv absent) so the zero-safe rates must all be 0.0
    assert 0 < len(rows) <= 100
    assert all(r.view_to_cart_rate == 0.0 for r in rows)
    assert [r.total_revenue for r in rows] == sorted(
        (r.total_revenue for r in rows), reverse=True
    )
    funnel = dashes["site_wide_funnel"].collect()
    assert [r.funnel_stage for r in funnel[1:]] == sorted(
        r.funnel_stage for r in funnel[1:]
    )
    assert len(funnel) == 3
    # session-driven dashboards are empty without events/sessions data,
    # but must still produce their full schemas
    assert dashes["sales_overview"].count() == 0
    assert dashes["customer_360"].count() == 0
    assert len(dashes["sales_overview"].columns) == 6
    assert len(dashes["customer_360"].columns) == 9


def test_order_items_backfill_and_positive_quantity(ref_run):
    tables, _ = ref_run
    items = tables["order_items_clean"]
    assert items.filter("quantity <= 0").count() == 0
    assert items.filter("order_date IS NULL").count() == 0
