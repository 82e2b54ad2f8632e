"""Analytics query suite (SURVEY.md §2B) — TPC-H-flavored plans adapted to
the driver testdata schema, written DataFrame-first so Catalyst handles
pushdown, pruning, join ordering, and AQE does runtime re-planning.

Numeric-parity rules (SURVEY.md §4): money math runs in exact DECIMAL so
sums are association-order independent (a shuffled 1000-executor cluster
must produce the same bits as local[32] and as the DuckDB oracle); final
outputs cast to DOUBLE. Event timestamps are emitted as epoch microseconds
(bigint) to dodge ns/us parquet reader differences between engines.

Each query has a DataFrame builder ``(spark, sf_dir) -> DataFrame`` in
``QUERIES`` and an equivalent DuckDB oracle in ``ORACLES`` with identical
output column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.functions.hints import (
    broadcast_if_bounded as bcast,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

# Exact decimal views of the money columns. (12,2) quantity/price and
# (6,4) rates keep every product within DECIMAL(38,*) in both Spark and
# DuckDB — no precision-loss rounding on either side. (Functions, not
# module constants: Column construction needs an active SparkContext.)
def _qty():
    return F.col("l_quantity").cast("decimal(12,2)")


def _price():
    return F.col("l_extendedprice").cast("decimal(12,2)")


def _disc():
    return F.col("l_discount").cast("decimal(6,4)")


def _tax():
    return F.col("l_tax").cast("decimal(6,4)")


def _rev():
    return _price() * (F.lit(1) - _disc())

_SQL_REV = (
    "cast(l_extendedprice as decimal(12,2))"
    " * (1 - cast(l_discount as decimal(6,4)))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Single scan → partial-agg (map-side combine) → final agg on the two
    low-cardinality group keys; the shipdate filter pushes to the scan.

    Money math is INT64 per row: cents = round(price·100), discount /
    tax in exact hundredths (the data's native granularity), so
    disc-price is cents·(100−d2) hundredth-cents and charge is
    cents·(100−d2)·(100+t2) ten-thousandth-cents — exact integer
    products in whole-stage codegen. The per-row DECIMAL(20,6)
    multiplies this replaces exceeded Spark's compact-long decimal
    range (precision > 18 → BigDecimal path) and measured 72 s at sf10
    vs 8 s for this form. Only the SUM runs in decimal (ADD-only,
    DECIMAL(28,0) headroom: the charge product is ~1e11/row, so int64
    would wrap past ~sf100 group sizes), and the one decimal→double
    conversion per output goes through a string cast (DuckDB's direct
    cast double-rounds past 2^53). Averages divide the same exact sums
    by the group count.
    """
    line = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * F.lit(100)).cast("bigint")
    d2 = F.round(F.col("l_discount") * F.lit(100)).cast("bigint")
    t2 = F.round(F.col("l_tax") * F.lit(100)).cast("bigint")
    disc_hc = cents * (F.lit(100) - d2)
    charge_tc = disc_hc * (F.lit(100) + t2)
    dsum = lambda c: F.sum(c.cast("decimal(28,0)")).cast("string").cast("double")
    n = F.count(F.lit(1))
    return (
        line.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("double").alias("sum_qty"),
            (dsum(cents) / F.lit(100.0)).alias("sum_base_price"),
            (dsum(disc_hc) / F.lit(10000.0)).alias("sum_disc_price"),
            (dsum(charge_tc) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("bigint")).cast("double") / n).alias("avg_qty"),
            (dsum(cents) / F.lit(100.0) / n).alias("avg_price"),
            n.alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(cents AS DECIMAL(28,0))) AS VARCHAR) AS DOUBLE)
    / 100.0 AS sum_base_price,
  CAST(CAST(SUM(CAST(cents * (100 - d2) AS DECIMAL(28,0))) AS VARCHAR)
       AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(CAST(SUM(CAST(cents * (100 - d2) * (100 + t2) AS DECIMAL(28,0)))
            AS VARCHAR) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(cents AS DECIMAL(28,0))) AS VARCHAR) AS DOUBLE)
    / 100.0 / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus, l_quantity,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d2,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS t2
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-09-02'
)
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped high-value orders. customer is tiny → broadcast
    into orders, then the orders⋈lineitem join shuffles on orderkey only
    after both filters have pruned at the scans."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    line = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        line.join(
            orders.join(bcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation. region/nation/supplier/customer all broadcast; only
    orders⋈lineitem shuffles."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    line = load_table(spark, sf_dir, "lineitem")
    return (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(bcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(bcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


_Q5_SQL = f"""
SELECT n_name, CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + single agg. All three predicates push
    down to the parquet scan (visible as PushedFilters)."""
    line = load_table(spark, sf_dir, "lineitem")
    return (
        line.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(_price() * _disc()), 2).cast("double").alias("revenue"))
    )


_Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue. Top-20 with a
    deterministic c_custkey tiebreak so LIMIT picks identical rows on any
    engine/partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    line = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per market segment: agg → unpartitioned window over 5
    rows (post-agg, so the window is trivially cheap at any scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")
    seg_rev = (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.sum(_rev()).alias("rev_dec"))
    )
    total = Window.partitionBy()
    return seg_rev.select(
        F.col("c_mktsegment"),
        F.round("rev_dec", 2).cast("double").alias("revenue"),
        (
            F.round("rev_dec", 2).cast("double")
            / F.round(F.sum("rev_dec").over(total), 2).cast("double")
        ).alias("share"),
    )


_Q_MARKET_SHARE_SQL = f"""
WITH seg AS (
  SELECT c_mktsegment, SUM({_SQL_REV}) AS rev_dec
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
       CAST(ROUND(rev_dec, 2) AS DOUBLE)
         / CAST(ROUND(SUM(rev_dec) OVER (), 2) AS DOUBLE) AS share
FROM seg
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within each brand — rank window with
    p_partkey tiebreak. part broadcasts; one shuffle on (brand) for the
    window after the partkey agg."""
    part = load_table(spark, sf_dir, "part")
    line = load_table(spark, sf_dir, "lineitem")
    per_part = (
        line.join(bcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.sum(_rev()).alias("rev_dec"))
    )
    # round 10: single window kept — Spark 4.1's WindowGroupLimit does
    # the map-side top-k per brand before the exchange (rank() is a
    # supported rank-like function for the pushdown)
    w = Window.partitionBy("p_brand").orderBy(
        F.col("rev_dec").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            F.round("rev_dec", 2).cast("double").alias("revenue"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_Q_TOPK_SQL = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, p_name, SUM({_SQL_REV}) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey, p_name
)
SELECT p_brand, p_partkey, p_name,
       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, RANK() OVER (PARTITION BY p_brand
                         ORDER BY rev_dec DESC, p_partkey) AS rnk
  FROM per_part
)
WHERE rnk <= 3
"""


def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by priority × status, pivoted. Explicit pivot values
    keep the plan a single pass (no extra distinct-values job)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )


_Q_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
FROM orders
GROUP BY o_orderpriority
"""

def q_orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt/UNPIVOT — the inverse reshape of ``q_orders_pivot``: the
    wide per-priority status columns fold back into tidy (priority,
    status, n_orders) rows via ``DataFrame.unpivot`` (ids/values/
    variable/value — the Spark 4 melt API). Pivot→unpivot is the
    round-trip every report-to-warehouse hand-off makes; the oracle is
    the direct GROUP BY, so a lossy reshape (dropped zero cells,
    swapped variable labels) goes gate-red. Zero-count cells are kept
    (coalesce before the melt) and re-dropped explicitly — making the
    n=0 semantics a visible choice, not an accident of the reshape."""
    wide = q_orders_pivot(spark, sf_dir)
    tidy = wide.unpivot(
        ids=["o_orderpriority"],
        values=["f_cnt", "o_cnt", "p_cnt"],
        variableColumnName="status_col",
        valueColumnName="n_orders",
    )
    return tidy.select(
        "o_orderpriority",
        F.upper(F.substring("status_col", 1, 1)).alias("o_orderstatus"),
        "n_orders",
    ).filter(F.col("n_orders") > 0)


_Q_UNPIVOT_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# events suite: windows, sessionization, funnel, as-of
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    two windows over the same (user_id, ts) partitioning, one shuffle.
    Timestamps handled as epoch micros; value summed in exact decimal."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("val_dec"),
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        ev.withColumn("prev_us", F.lag("ts_us").over(order))
        .withColumn(
            "is_new",
            (
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US)
            ).cast("bigint"),
        )
        .withColumn("session_id", F.sum("is_new").over(run))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum("val_dec").cast("double").alias("total_value"),
    )


_Q_SESSIONIZE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, (epoch_ns(ts) // 1000) AS ts_us,
         CAST(value AS DECIMAL(18,6)) AS val_dec
  FROM events
), lagged AS (
  SELECT *, LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
            AS prev_us
  FROM ev
), marked AS (
  SELECT *, CAST(prev_us IS NULL OR ts_us - prev_us > {SESSION_GAP_US}
                 AS BIGINT) AS is_new
  FROM lagged
), sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(ts_us) - MIN(ts_us) AS duration_us,
       CAST(SUM(val_dec) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_id
"""

ROLLING_7D_US = 7 * 24 * 3600 * 1_000_000


def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 7-day rolling sum/count of value — RANGE window over epoch
    micros. Decimal accumulator: a sliding-frame optimizer may add/subtract
    in a different order than a recompute, which is only safe exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("val_dec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLLING_7D_US, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("val_dec").over(w).cast("double").alias("rolling_7d_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_7d_cnt"),
    )


_Q_ROLLING_SQL = f"""
SELECT user_id, event_id, (epoch_ns(ts) // 1000) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         AS rolling_7d_sum,
       COUNT(*) OVER w AS rolling_7d_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000)
             RANGE BETWEEN {ROLLING_7D_US} PRECEDING AND CURRENT ROW)
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase funnel: stage timestamps built by
    conditional aggregation per user (one shuffle), counts in one row."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    signup = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts_us").alias("ts_signup")
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .join(signup, "user_id")
        .filter(F.col("ts_us") > F.col("ts_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_click"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("ts_us") > F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_purchase"))
    )
    return (
        signup.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(click.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(purchase.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


_Q_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), su AS (
  SELECT user_id, MIN(ts_us) AS ts_signup FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), cl AS (
  SELECT e.user_id, MIN(e.ts_us) AS ts_click
  FROM ev e JOIN su USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us > su.ts_signup
  GROUP BY e.user_id
), pu AS (
  SELECT e.user_id, MIN(e.ts_us) AS ts_purchase
  FROM ev e JOIN cl USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > cl.ts_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM su) AS n_signup,
       (SELECT COUNT(*) FROM cl) AS n_click_after,
       (SELECT COUNT(*) FROM pu) AS n_purchase_after
"""


_MIN_US = 60 * 1_000_000
_HOUR_LAT_US = 3_600 * 1_000_000
_DAY_LAT_US = 24 * _HOUR_LAT_US


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency SLA report on top of the funnel: per stage
    transition (signup→click, click→purchase), how long converting
    users took — min/mean/max plus SLA buckets (<1 min, <1 h, <1 d).
    Buckets instead of exact quantiles by design: integer threshold
    counts are partial-aggregable (one map-side-combining shuffle) and
    bit-portable, where a cross-engine quantile interpolation on
    arbitrary µs gaps is the §4 divergence class. Same three
    conditional-agg joins as ``q_events_funnel`` — per-user stage
    timestamps, never a self-join of raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_signup"))
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .join(signup, "user_id")
        .filter(F.col("ts_us") > F.col("ts_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_click"), F.min("ts_signup").alias("ts_signup_k"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("ts_us") > F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_purchase"), F.min("ts_click").alias("ts_click_k"))
    )
    lat1 = click.select(
        F.lit("signup_to_click").alias("stage"),
        (F.col("ts_click") - F.col("ts_signup_k")).alias("lat_us"),
    )
    lat2 = purchase.select(
        F.lit("click_to_purchase").alias("stage"),
        (F.col("ts_purchase") - F.col("ts_click_k")).alias("lat_us"),
    )
    return (
        lat1.unionByName(lat2)
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lat_us").alias("min_us"),
            F.max("lat_us").alias("max_us"),
            F.expr("sum(lat_us) div count(1)").alias("avg_us"),
            F.sum((F.col("lat_us") < _MIN_US).cast("long")).alias(
                "n_lt_1m"
            ),
            F.sum((F.col("lat_us") < _HOUR_LAT_US).cast("long")).alias(
                "n_lt_1h"
            ),
            F.sum((F.col("lat_us") < _DAY_LAT_US).cast("long")).alias(
                "n_lt_1d"
            ),
        )
    )


_Q_FUNNEL_LATENCY_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), su AS (
  SELECT user_id, MIN(ts_us) AS ts_signup FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), cl AS (
  SELECT e.user_id, MIN(e.ts_us) AS ts_click,
         MIN(su.ts_signup) AS ts_signup_k
  FROM ev e JOIN su USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us > su.ts_signup
  GROUP BY e.user_id
), pu AS (
  SELECT e.user_id, MIN(e.ts_us) AS ts_purchase,
         MIN(cl.ts_click) AS ts_click_k
  FROM ev e JOIN cl USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > cl.ts_click
  GROUP BY e.user_id
), lat AS (
  SELECT 'signup_to_click' AS stage, ts_click - ts_signup_k AS lat_us
  FROM cl
  UNION ALL
  SELECT 'click_to_purchase', ts_purchase - ts_click_k FROM pu
)
SELECT stage, COUNT(*) AS n_users,
       MIN(lat_us) AS min_us, MAX(lat_us) AS max_us,
       CAST(SUM(lat_us) // COUNT(*) AS BIGINT) AS avg_us,
       CAST(SUM(CASE WHEN lat_us < {_MIN_US} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lt_1m,
       CAST(SUM(CASE WHEN lat_us < {_HOUR_LAT_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lt_1h,
       CAST(SUM(CASE WHEN lat_us < {_DAY_LAT_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lt_1d
FROM lat GROUP BY stage
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Spark has no ASOF JOIN; the scalable formulation is the union-window
    trick — sort each user's event stream once and carry the last click
    timestamp forward (last(..., ignorenulls) over ROWS UNBOUNDED
    PRECEDING). One shuffle on user_id; no range join, no explosion.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("click_ts").alias("asof_click_ts_us"),
            (F.col("ts_us") - F.col("click_ts")).alias("gap_us"),
        )
    )


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each purchase matched to the temporally
    CLOSEST click, before or after, tie → the earlier one. Same
    union-window shape as ``q_asof_join`` — one sort per user carries
    the last prior click forward AND the first later click backward
    (two frames over the same sorted stream, no second shuffle), then a
    pure projection picks the smaller gap. No range join, no
    candidate explosion, scales exactly like the backward variant."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = ev.select(
        "*",
        F.last(click_ts, ignorenulls=True).over(back).alias("prev_click"),
        F.first(click_ts, ignorenulls=True).over(fwd).alias("next_click"),
    )
    prev_gap = F.col("ts_us") - F.col("prev_click")
    next_gap = F.col("next_click") - F.col("ts_us")
    take_prev = F.col("prev_click").isNotNull() & (
        F.col("next_click").isNull() | (prev_gap <= next_gap)
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.when(take_prev, F.col("prev_click"))
        .otherwise(F.col("next_click"))
        .alias("nearest_click_ts_us"),
        F.when(take_prev, prev_gap).otherwise(next_gap).alias("abs_gap_us"),
        F.when(take_prev, F.lit("before"))
        .when(F.col("next_click").isNotNull(), F.lit("after"))
        .alias("direction"),
    )


_Q_ASOF_NEAREST_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), carried AS (
  SELECT *,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_click,
         FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_click
  FROM ev
)
SELECT event_id, user_id, ts_us AS purchase_ts_us,
       CASE WHEN take_prev THEN prev_click ELSE next_click END
         AS nearest_click_ts_us,
       CASE WHEN take_prev THEN ts_us - prev_click
            ELSE next_click - ts_us END AS abs_gap_us,
       CASE WHEN take_prev THEN 'before'
            WHEN next_click IS NOT NULL THEN 'after' END AS direction
FROM (SELECT *,
             prev_click IS NOT NULL AND
             (next_click IS NULL OR ts_us - prev_click <= next_click - ts_us)
               AS take_prev
      FROM carried)
WHERE event_type = 'purchase'
"""


_Q_ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), carried AS (
  SELECT *,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS click_ts
  FROM ev
)
SELECT event_id, user_id, ts_us AS purchase_ts_us,
       click_ts AS asof_click_ts_us,
       ts_us - click_ts AS gap_us
FROM carried
WHERE event_type = 'purchase'
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 flavor: promo revenue share for one ship-year.
    Conditional aggregation over lineitem ⋈ broadcast(part); the year
    predicate pushes to the lineitem scan. Ratio of two decimal-exact
    sums → bit-stable double."""
    line = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = line.join(bcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    )
    total = F.sum(_rev())
    return j.agg(
        (
            F.lit(100.0) * promo.cast("double") / total.cast("double")
        ).alias("promo_revenue_pct"),
        F.round(promo, 2).cast("double").alias("promo_revenue"),
        F.round(total, 2).cast("double").alias("total_revenue"),
    )


_Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV}
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM({_SQL_REV}) AS DOUBLE) AS promo_revenue_pct,
       CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV}
                           ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
         AS promo_revenue,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
"""

LARGE_ORDER_QTY = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 flavor: orders whose total quantity exceeds a
    threshold, with customer attribution. Aggregate-then-having runs
    BEFORE the joins, so only qualifying orderkeys (a tiny set) reach
    the orders/customer join — the decorrelated form of the original
    IN-subquery."""
    line = load_table(spark, sf_dir, "lineitem")
    big = (
        line.groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice")
            .cast("decimal(12,2)")
            .cast("double")
            .alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {LARGE_ORDER_QTY}
)
SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 flavor: revenue from three disjoint (brand, size,
    quantity-band) channels — the disjunctive-predicate stress test.
    Catalyst extracts the common l_quantity bounds for scan pushdown and
    evaluates the per-branch residual after the broadcast join."""
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = line.join(bcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size") <= 10)
            & qty.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & (F.col("p_size") <= 25)
            & qty.between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#32")
            & (F.col("p_size") <= 40)
            & qty.between(20, 35)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_SQL = f"""
SELECT CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#21' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#32' AND p_size <= 40 AND l_quantity BETWEEN 20 AND 35)
"""


def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: customers with above-average positive balances
    and no orders since 1998, grouped by nation. The scalar subquery
    (global avg) broadcasts as a 1-row cross join; the NOT EXISTS is a
    left-anti join — both decorrelated, no per-row subquery execution."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    avg_bal = cust.filter(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    wealthy = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("bal").cast("double") > F.col("avg_bal")
    )
    inactive = wealthy.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum("bal").cast("double").alias("total_bal"),
    )


_Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_bal
  FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0
)
SELECT c_nationkey, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_nationkey
"""


QUERIES = {
    "q_asof_nearest": q_asof_nearest,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q_market_share": q_market_share,
    "q_topk_per_group": q_topk_per_group,
    "q_orders_pivot": q_orders_pivot,
    "q_events_sessionize": q_events_sessionize,
    "q_events_rolling": q_events_rolling,
    "q_events_funnel": q_events_funnel,
    "q_funnel_latency": q_funnel_latency,
    "q_orders_unpivot": q_orders_unpivot,
    "q_asof_join": q_asof_join,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_wealthy_inactive": q22_wealthy_inactive,
}

ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier": _Q5_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q10_returned_items": _Q10_SQL,
    "q_market_share": _Q_MARKET_SHARE_SQL,
    "q_topk_per_group": _Q_TOPK_SQL,
    "q_orders_pivot": _Q_PIVOT_SQL,
    "q_events_sessionize": _Q_SESSIONIZE_SQL,
    "q_events_rolling": _Q_ROLLING_SQL,
    "q_events_funnel": _Q_FUNNEL_SQL,
    "q_funnel_latency": _Q_FUNNEL_LATENCY_SQL,
    "q_orders_unpivot": _Q_UNPIVOT_SQL,
    "q_asof_join": _Q_ASOF_SQL,
    "q_asof_nearest": _Q_ASOF_NEAREST_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q22_wealthy_inactive": _Q22_SQL,
}
