"""Relational-surface extensions beyond the reference's operator set:
pivot/unpivot, ROLLUP/CUBE grouping sets, semi/anti joins, set
operations, and window-frame (moving/cumulative) aggregates.

The reference exercises none of these (SURVEY.md §2.7: "No INTERSECT /
EXCEPT / UNION DISTINCT anywhere"; §2.5: row_number is its entire
window surface; its pivot is the conditional-count idiom,
/root/reference/03_gold/03_gold_aggregate.py:48-54) — but a user
switching engines expects the full relational vocabulary, so each gets
a first-class, oracle-checked query here.

Cross-engine exactness (registry.py rules): every money sum — including
WINDOW sums, where double accumulation order differs between engines —
runs in DECIMAL(30,6); day arithmetic uses explicit integer
epoch-days; DuckDB ``GROUPING(a, b)`` produces the same
leftmost-is-MSB bitmask as Spark's ``grouping_id()`` (verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.math import dec_sum
from .plans import gold
from .plans.silver import silver_events, silver_orders
from .registry import _t, query

_DEC = "decimal(30,6)"

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------

_PIVOT_CELLS = ",\n      ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}_events"
    for t in _EVENT_TYPES
)

@query(
    "ext_pivot_events",
    oracle=f"""
    SELECT CAST(CAST(user_id AS BIGINT) AS VARCHAR) AS user_id,
      {_PIVOT_CELLS},
      CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS purchase_revenue
    FROM events GROUP BY 1
    """,
)
def ext_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True relational PIVOT: one row per user, one column per event
    type (``groupBy().pivot(values=...)``). Passing the explicit value
    list matters twice over: it skips the driver-side distinct pass
    Spark otherwise runs to discover the columns, and it keeps the
    output schema static — both requirements at 100 TB. The reference
    only ever hand-rolled this with conditional sums
    (03_gold_aggregate.py:48-54)."""
    ev = silver_events(_t(spark, sf_dir, "events"))
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", F.col("amount_usd")).otherwise(0.0).cast(_DEC)).alias("rev"),
        )
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_events")
            for t in _EVENT_TYPES
        ],
        sum(
            (F.coalesce(F.col(f"{t}_rev"), F.lit(0).cast(_DEC)) for t in _EVENT_TYPES),
            F.lit(0).cast(_DEC),
        ).cast("double").alias("purchase_revenue"),
    )


@query(
    "ext_unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def ext_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) of the lineitem measures via the
    native ``DataFrame.unpivot`` — a single Expand node, one scan, no
    self-union (the UNION-ALL oracle re-reads the table four times;
    the Spark plan must not)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn(
        "metric", F.regexp_replace("metric", "^l_", "")
    )


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP / CUBE
# ---------------------------------------------------------------------------

@query(
    "ext_rollup_revenue",
    oracle="""
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
      o_orderstatus AS status,
      CAST(GROUPING(CAST(year(CAST(o_orderdate AS DATE)) AS INT), o_orderstatus) AS BIGINT) AS gid,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
      COUNT(*) AS order_count
    FROM orders
    GROUP BY ROLLUP (1, 2)
    """,
)
def ext_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, status): detail + per-year subtotal + grand total
    in ONE aggregation pass (Spark plans a single Expand + partial/final
    HashAggregate — not three scans), with ``grouping_id`` to tell the
    levels apart."""
    orders = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("date")).alias("order_year")
    return (
        orders.select(year, F.col("o_orderstatus").alias("status"), "o_totalprice")
        .rollup("order_year", "status")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            dec_sum(F.col("o_totalprice")).alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


@query(
    "ext_cube_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
      COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def ext_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping sets in one
    pass — the TPC-H Q1 surface extended with subtotal planes."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins and set operations
# ---------------------------------------------------------------------------

@query(
    "ext_join_semi_anti",
    oracle="""
    SELECT c_custkey AS customer_id, 'buyer' AS cohort FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND year(CAST(o.o_orderdate AS DATE)) = 1996)
    UNION ALL
    SELECT c_custkey, 'non_buyer' FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND year(CAST(o.o_orderdate AS DATE)) = 1996)
    """,
)
def ext_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI join (EXISTS / NOT EXISTS): 1996 buyers
    vs non-buyers. Semi/anti never duplicate the left side and never
    materialize right-side columns — at scale this is the correct plan
    for existence checks, not a join+distinct."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id")
    )
    orders_96 = (
        _t(spark, sf_dir, "orders")
        .filter(F.year(F.col("o_orderdate").cast("date")) == 1996)
        .select(F.col("o_custkey").alias("customer_id"))
    )
    buyers = cust.join(orders_96, "customer_id", "left_semi").withColumn(
        "cohort", F.lit("buyer")
    )
    non_buyers = cust.join(orders_96, "customer_id", "left_anti").withColumn(
        "cohort", F.lit("non_buyer")
    )
    return buyers.unionByName(non_buyers)


@query(
    "ext_setops_users",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT user_id, 'view_and_purchase' AS cohort FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
    UNION ALL
    SELECT user_id, 'view_only' FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
    """,
)
def ext_setops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set ops (SURVEY.md §2.7 gap): users who both
    viewed and purchased vs viewed-only. Spark plans these as
    semi/anti hash joins over pre-aggregated sets."""
    ev = _t(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = viewers.intersect(buyers).withColumn(
        "cohort", F.lit("view_and_purchase")
    )
    view_only = viewers.subtract(buyers).withColumn("cohort", F.lit("view_only"))
    return both.unionByName(view_only)


# ---------------------------------------------------------------------------
# Histogram, per-group top-k, correlated scalar subquery
# ---------------------------------------------------------------------------

# ext_histogram_totals RETIRED (r12) to free a capacity slot for
# ext_delta_widened_read: its fixed-width floor-bin + partial/final
# aggregate shape is strictly subsumed by ext_groupwise_stats /
# ext_winsorized_stats (both stay externally gated), and the binning
# arithmetic is pinned by
# tests/test_dq_and_cleaning.py::test_histogram_fixed_width_bins.


@query(
    "ext_topk_per_group",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
        SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS rev_dec
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    )
    SELECT p_brand, l_partkey AS part_key,
      CAST(rev_dec AS DOUBLE) AS part_revenue, rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
                ORDER BY rev_dec DESC, l_partkey) AS rk
      FROM rev
    ) WHERE rk <= 3
    """,
)
def ext_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by revenue: key-partitioned agg →
    windowed rank. The rank ORDER BY runs on the exact DECIMAL (not
    the double projection) so cross-engine ordering can't diverge on
    sub-ULP ties; partkey breaks exact ties. The part dim joins
    broadcast (plan-asserted for gold models in test_plan_shapes.py)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("rev_dec").desc(), "l_partkey"
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "p_brand",
            F.col("l_partkey").alias("part_key"),
            F.col("rev_dec").cast("double").alias("part_revenue"),
            "rk",
        )
    )


@query(
    "ext_scalar_subquery",
    oracle="""
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           o_totalprice AS total
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def ext_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer's largest order),
    run through the SQL entry point so Catalyst's decorrelation
    rewrites it into an aggregate + join — no per-row re-execution
    (the §4 'built-in: subquery decorrelation' claim, exercised).
    MAX of doubles is order-independent, so no decimal routing is
    needed."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey AS order_id, o_custkey AS customer_id,
               o_totalprice AS total
        FROM orders_sq o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_sq o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ---------------------------------------------------------------------------
# SCD Type 2 + MERGE upsert (operators/scd.py)
# ---------------------------------------------------------------------------

@query(
    "ext_scd2_user_state",
    oracle="""
    WITH ev AS (
      SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS state,
             epoch_us(ts) AS ts_us, event_id
      FROM events
    ), f AS (
      SELECT user_id, state, ts_us, event_id,
        CASE WHEN state IS DISTINCT FROM
               LAG(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             THEN 1 ELSE 0 END AS chg
      FROM ev
    ), r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM f
    ), iv AS (
      SELECT user_id, run, MIN(state) AS state, MIN(ts_us) AS valid_from_us
      FROM r GROUP BY 1, 2
    )
    SELECT user_id, state, valid_from_us,
      LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run) AS valid_to_us,
      LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run) IS NULL AS is_current
    FROM iv
    """,
)
def ext_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 collapse (operators/scd.py, gaps-and-islands): each
    user's event-type history folded into consecutive-state validity
    intervals with ``valid_from``/``valid_to``/``is_current`` — the
    dimension-history build the reference's overwrite pipeline never
    materializes. Timestamps compare at microseconds; event_id breaks
    ordering ties."""
    from .operators.scd import scd2_collapse

    ev = silver_events(_t(spark, sf_dir, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("state"),
        F.unix_micros("event_ts").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    out = scd2_collapse(
        ev,
        key_cols=["user_id"],
        state_cols=["state"],
        order_col="ts_us",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "state",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
    )


@query(
    "ext_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey AS order_id, o_orderstatus AS status, o_totalprice AS total
      FROM orders
    ), src AS (
      SELECT o_orderkey AS order_id, o_orderstatus AS status,
             o_totalprice * 1.1 AS total
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
      UNION ALL
      SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
    )
    SELECT t.* FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.order_id = t.order_id)
    UNION ALL
    SELECT * FROM src
    """,
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert (operators/scd.py): a change-set of corrected 1996
    totals (matched → update) plus brand-new 1997-derived keys
    (unmatched → insert) merged into the orders snapshot via
    anti-join ∪ source. The double multiply is IEEE-deterministic, so
    the oracle reproduces updated totals bit-for-bit."""
    from .operators.scd import merge_upsert

    orders = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("date"))
    target = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    updates = orders.filter(year == 1996).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice") * 1.1).alias("total"),
    )
    inserts = orders.filter(year == 1997).select(
        (F.col("o_orderkey") + 1000000000).alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    return merge_upsert(target, updates.unionByName(inserts), ["order_id"])


# ---------------------------------------------------------------------------
# IQR outlier fences
# ---------------------------------------------------------------------------

@query(
    "ext_outlier_iqr",
    oracle="""
    WITH q AS (
      SELECT o_orderstatus AS status,
        quantile_cont(o_totalprice, 0.25) AS p25,
        quantile_cont(o_totalprice, 0.75) AS p75
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey AS order_id, q.status, o.o_totalprice AS total,
      q.p25 - 0.5 * (q.p75 - q.p25) AS fence_lo,
      q.p75 + 0.5 * (q.p75 - q.p25) AS fence_hi,
      o.o_totalprice > q.p75 + 0.5 * (q.p75 - q.p25) AS is_high
    FROM orders o JOIN q ON o.o_orderstatus = q.status
    WHERE o.o_totalprice < q.p25 - 0.5 * (q.p75 - q.p25)
       OR o.o_totalprice > q.p75 + 0.5 * (q.p75 - q.p25)
    """,
)
def ext_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: exact interpolated
    quartiles (Spark ``percentile`` == DuckDB ``quantile_cont``
    bit-for-bit) → k×IQR fences → flagged rows. k = 0.5 rather than
    Tukey's 1.5 because the synthetic fixture's totals are near-
    uniform (no heavy tail — 1.5 flags nothing at any SF); the
    operator shape is multiplier-independent. The per-group
    quantile frame is tiny and broadcast back onto the facts, so
    flagging costs one scan + one map-side join at any scale."""
    orders = _t(spark, sf_dir, "orders")
    q = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        )
    )
    lo = F.col("p25") - 0.5 * (F.col("p75") - F.col("p25"))
    hi = F.col("p75") + 0.5 * (F.col("p75") - F.col("p25"))
    return (
        orders.join(
            F.broadcast(q), orders["o_orderstatus"] == q["status"]
        )
        .filter((F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi))
        .select(
            F.col("o_orderkey").alias("order_id"),
            "status",
            F.col("o_totalprice").alias("total"),
            lo.alias("fence_lo"),
            hi.alias("fence_hi"),
            (F.col("o_totalprice") > hi).alias("is_high"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC) + event path analysis
# ---------------------------------------------------------------------------

@query(
    "ext_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS order_id, o_orderstatus AS status, o_totalprice AS total
      FROM orders
    ), new AS (
      SELECT o_orderkey AS order_id, o_orderstatus AS status,
             o_totalprice * 1.1 AS total
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) != 1996
        AND year(CAST(o_orderdate AS DATE)) != 1998
    )
    SELECT COALESCE(o.order_id, n.order_id) AS order_id,
      CASE WHEN o.order_id IS NULL THEN 'insert'
           WHEN n.order_id IS NULL THEN 'delete'
           ELSE 'update' END AS change_type,
      o.total AS old_total, n.total AS new_total
    FROM old o FULL OUTER JOIN new n ON o.order_id = n.order_id
    WHERE o.order_id IS NULL OR n.order_id IS NULL
       OR o.status IS DISTINCT FROM n.status
       OR o.total IS DISTINCT FROM n.total
    """,
)
def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC without a log): full-outer join of two table
    versions keyed on the PK, emitting only insert/update/delete rows
    — the change feed you reconstruct when the source has no CDC. The
    inverse of ext_merge_upsert: diff(old, merge(old, delta)) ≡ delta.
    Here the 'new' version re-prices 1996 orders and drops 1998 ones;
    null-safe comparisons make NULL attribute flips visible."""
    orders = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("date"))
    old = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    new = (
        orders.filter(year == 1996)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("status"),
            (F.col("o_totalprice") * 1.1).alias("total"),
        )
        .unionByName(
            orders.filter((year != 1996) & (year != 1998)).select(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
            )
        )
    )
    from .operators.scd import snapshot_diff

    return snapshot_diff(
        old, new, key_cols=["order_id"], value_cols=["status", "total"]
    ).select("order_id", "change_type", "old_total", "new_total")


@query(
    "ext_event_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id,
        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM seq GROUP BY 1
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def ext_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: each user's full ordered event-type
    sequence (ties broken by event_id for a total order) → top-20
    paths by frequency. The ordered collect is
    ``sort_array(collect_list(struct(...)))`` — per-key arrays, never
    a driver-side collect — and path frequencies are one further
    partial+final agg feeding a TakeOrderedAndProject."""
    ev = silver_events(_t(spark, sf_dir, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_micros("event_ts").alias("ts_us"),
    )
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts_us", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        seq.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Exact statistics, ordered funnel, table profile
# ---------------------------------------------------------------------------

@query(
    "ext_stats_correlation",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
        COUNT(*) AS n,
        SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
        SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
        SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
        SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
        SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
      (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
        / (sqrt(n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
           * sqrt(n * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
        AS qty_price_corr,
      sqrt((n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / (CAST(n AS DOUBLE) * n)) AS qty_stddev_pop
    FROM m
    """,
)
def ext_stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population stddev per group, EXACT across
    engines: built-in ``corr``/``stddev`` accumulate co-moments in
    doubles (order-dependent → never hash-comparable), so the
    co-moments are computed as DECIMAL sums — exact and
    order-independent — and only the final closed-form division runs
    in double (deterministic IEEE on identical inputs). Still one
    partial+final aggregate pass. Oracle gotcha: DuckDB's wide-decimal
    → double cast divides in floating point and is NOT correctly
    rounded (2540249026.99 → ...9900002), so the oracle routes the
    cast through VARCHAR (strtod is correctly rounded, matching
    Spark's decimal→double)."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(19,6)")
    y = F.col("l_extendedprice").cast("decimal(19,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    return m.select(
        "l_returnflag",
        "n",
        ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
         ).alias("qty_price_corr"),
        F.sqrt((n * sxx - sx * sx) / (n.cast("double") * n)).alias(
            "qty_stddev_pop"
        ),
    )


@query(
    "ext_ordered_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
      FROM events e JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > v.v_us
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN c ON e.user_id = c.user_id AND epoch_us(e.ts) > c.c_us
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT v.user_id,
      v.v_us // 1000000 AS first_view_sec,
      c.c_us // 1000000 AS first_click_sec,
      p.p_us // 1000000 AS first_purchase_sec,
      c.user_id IS NOT NULL AS reached_click,
      p.user_id IS NOT NULL AS reached_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def ext_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-sensitive conversion funnel: first view, first click
    STRICTLY AFTER that view, first purchase strictly after that click
    — the sequence-matching funnel (the reference's funnel counts
    stages independently, analysis/dashboard_queries/03:4-18, so a
    purchase before any view still counts; this one requires the
    v→c→p ordering). Each stage is a key-partitioned min-agg joined
    back on the key — three shuffles on user_id total, no windows over
    raw events."""
    ev = silver_events(_t(spark, sf_dir, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.unix_micros("event_ts").alias("ts_us"),
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.floor(F.col("v_us") / 1_000_000).cast("long").alias("first_view_sec"),
            F.floor(F.col("c_us") / 1_000_000).cast("long").alias("first_click_sec"),
            F.floor(F.col("p_us") / 1_000_000).cast("long").alias("first_purchase_sec"),
            F.col("c_us").isNotNull().alias("reached_click"),
            F.col("p_us").isNotNull().alias("reached_purchase"),
        )
    )


# ext_profile_orders RETIRED (r12) to free a capacity slot for
# ext_delta_identity: its single partial+final aggregate shape is
# strictly subsumed by the externally-gated ext_groupwise_stats /
# ext_winsorized_stats, and operators/profile.py's one-pass
# nulls/min-max contract is pinned by
# tests/test_dq_and_cleaning.py::test_profile_table_one_pass.


# ---------------------------------------------------------------------------
# Z-order layout + blocked fuzzy join (operators/zorder.py, linkage.py)
# ---------------------------------------------------------------------------

_Z_BITS = 10
_Z_TERMS = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)

@query(
    "ext_zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey,
        o_custkey % 1024 AS x,
        datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 1024 AS y
      FROM orders
    )
    SELECT o_orderkey, CAST(x AS BIGINT) AS cust_bucket,
      CAST(y AS BIGINT) AS day_bucket,
      CAST({_Z_TERMS} AS BIGINT) AS zvalue
    FROM b
    """,
)
def ext_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (operators/zorder.py): customer
    and order-day buckets bit-interleaved into one sort key, so a
    z-sorted file layout carries tight min/max on BOTH dimensions and
    parquet skipping fires for either predicate — what date
    partitioning alone can't give. Pure shift/and arithmetic,
    reproduced bit-for-bit by the oracle; the locality property itself
    is asserted in tests/test_zorder.py."""
    from .operators.zorder import z_value

    orders = _t(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(1024)).cast("long")
    y = F.pmod(
        F.unix_date(F.col("o_orderdate").cast("date")), F.lit(1024)
    ).cast("long")
    return orders.select(
        "o_orderkey",
        x.alias("cust_bucket"),
        y.alias("day_bucket"),
        z_value([x, y], bits=_Z_BITS).alias("zvalue"),
    )


@query(
    "ext_fuzzy_blocked_join",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      a.c_name AS text_a, b.c_name AS text_b,
      CAST(levenshtein(a.c_name, b.c_name) AS INT) AS distance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def ext_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators/linkage.py): near-identical customer
    names within a nation block — equi-join on the blocking key (hash
    join, no cross product), exact levenshtein refine (verified
    bit-compatible across engines). The LSH-free end of the fuzzy-
    matching spectrum; blocking selectivity is the scale knob."""
    from .operators.linkage import blocked_fuzzy_join

    cust = _t(spark, sf_dir, "customer")
    return blocked_fuzzy_join(
        cust,
        id_col="c_custkey",
        text_col="c_name",
        block_cols=["c_nationkey"],
        max_distance=1,
    ).select("id_a", "id_b", "text_a", "text_b", "distance")


# ---------------------------------------------------------------------------
# Window frames: moving + cumulative aggregates
# ---------------------------------------------------------------------------

# ext_moving_revenue RETIRED (r13) to free a capacity slot for
# ext_delta_v2_checkpoint: its explicit-frame surface (rangeBetween
# on integer epoch-days + rowsBetween over a days-not-rows rollup) is
# subsumed by ext_window_funcs / ext_running_gold_totals (both stay
# externally gated), and the trailing-frame arithmetic is pinned by
# tests/test_dq_and_cleaning.py::test_moving_frame_range_between.


@query(
    "ext_running_gold_totals",
    # the daily-metrics CTE is the registered gold model's own oracle,
    # spliced by the deferred-token resolver
    oracle="""
    WITH dm AS (__ORACLE_GOLD_DAILY_METRICS__)
    SELECT event_date, gross_revenue,
      CAST(SUM(CAST(gross_revenue AS DECIMAL(30,6))) OVER w_run AS DOUBLE)
        AS run_revenue,
      CAST(SUM(view_count) OVER w_run AS BIGINT) AS run_views,
      FIRST_VALUE(gross_revenue) OVER w_all AS month_open_revenue,
      LAST_VALUE(gross_revenue) OVER w_all AS month_close_revenue,
      MAX(gross_revenue) OVER w_prior AS prior_peak_revenue
    FROM dm
    WINDOW
      w_run AS (PARTITION BY date_trunc('month', event_date)
                ORDER BY event_date
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_all AS (PARTITION BY date_trunc('month', event_date)
                ORDER BY event_date
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      w_prior AS (PARTITION BY date_trunc('month', event_date)
                  ORDER BY event_date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def ext_running_gold_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals and open/close/prior-peak frames over the gold
    daily model — the ``rowsBetween`` surface a BI user reaches for on
    the reference's gold tables (month-to-date revenue, month open vs
    close, "previous record day"): unbounded-preceding running sums,
    ``first_value``/``last_value`` over the full-partition frame, and
    a MAX over ``(unbounded, -1)`` that excludes the current row (the
    1-PRECEDING upper bound plays SQL's EXCLUDE CURRENT ROW, which
    Spark frames don't spell natively). The running money sum stays in
    DECIMAL through the frame so accumulation order (running scan vs
    segment tree) cannot change the double. Windows partition by month
    over the DATE-GRAIN aggregate — cardinality is days, not corpus
    rows, so no partition is ever large at any data scale, and the
    month key bounds each task's frame besides."""
    ev = silver_events(_t(spark, sf_dir, "events"))
    orders = silver_orders(_t(spark, sf_dir, "orders"))
    dm = gold.gold_daily_metrics(ev, orders)
    month = F.trunc("event_date", "month")
    w_run = (
        Window.partitionBy(month)
        .orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy(month)
        .orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_prior = (
        Window.partitionBy(month)
        .orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return dm.select(
        "event_date",
        "gross_revenue",
        F.sum(F.col("gross_revenue").cast(_DEC))
        .over(w_run)
        .cast("double")
        .alias("run_revenue"),
        F.sum("view_count").over(w_run).cast("long").alias("run_views"),
        F.first("gross_revenue").over(w_all).alias("month_open_revenue"),
        F.last("gross_revenue").over(w_all).alias("month_close_revenue"),
        F.max("gross_revenue").over(w_prior).alias("prior_peak_revenue"),
    )


# Deferred oracle-nesting tokens (see registry.resolve_deferred_oracles):
# this module may be the first-imported, hence the last to finish — run
# the idempotent resolver so every token is spliced regardless of order.
from .registry import resolve_deferred_oracles as _rdo  # noqa: E402
_rdo()
del _rdo
