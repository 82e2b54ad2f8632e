"""Time-series / behavioral analytics (SURVEY.md §2B) — change
detection, correlation structure, latency SLAs, and distributional
reports over the driver testdata, written DataFrame-first.

Numeric-parity rules follow SURVEY.md §4: every float that reaches the
output is a SINGLE deterministic expression over EXACT integer/decimal
aggregates (quantize→BIGINT or DECIMAL pre-agg), so a 1000-executor
shuffle order produces the same bits as local[32] and as the DuckDB
oracle. Event timestamps are the catalog's epoch-ns bigints; order/ship
dates are naive timestamps read identically by both engines.

Scale notes (100 TB): every entry here aggregates the raw scan down to
a bounded series FIRST (hours of the time span, days, brands, buckets)
and runs its window/self-join logic on that series — global-ORDER
windows only ever see the bounded series, never the raw table, so the
single-partition window stage is O(series), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.functions.hints import (
    broadcast_if_bounded as bcast,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

_HOUR_NS = 3_600_000_000_000
_MIN_NS = 60_000_000_000


def _dec2d(col):
    """DECIMAL → DOUBLE through a string cast. DuckDB's direct
    decimal→double conversion double-rounds once the unscaled value
    exceeds 2^53 (measured: q_autocorr_daily sf1 hash break), while
    decimal→varchar→double is correctly rounded in BOTH engines
    (strtod / Double.parseDouble). Oracle side mirrors with
    CAST(CAST(x AS VARCHAR) AS DOUBLE)."""
    c = col if not isinstance(col, str) else F.col(col)
    return c.cast("string").cast("double")


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point score over the hourly event-value series.

    The textbook one-sided CUSUM is the recursion
    ``S_t = max(0, S_{t-1} + (x_t - mean))`` — not directly a window
    function. It has the closed form ``S_t = P_t - min(0, min_{i<=t}
    P_i)`` with prefix sums ``P_t = sum_{i<=t}(x_i - mean)``, which IS
    expressible as two running windows (cumsum + running min), so both
    engines compute it declaratively with no recursion or UDF.

    Parity: per-hour totals quantize value to milli-units
    (``floor(value*1000)`` → BIGINT) so Σx and the running cumsum are
    exact integers; the global moments use a DECIMAL(19,0)² sum for
    Σx² (bigint would wrap past ~sf1). Every double in the output is
    one fixed-shape expression over those exact aggregates.

    Scale: one groupBy collapses the raw scan to ≤ #hours-of-span rows
    (partial agg executor-side); the ORDER BY windows and the broadcast
    moment join run on that bounded series only.
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr(f"ts div {_HOUR_NS}").alias("hour"),
            F.floor(F.col("value") * F.lit(1000)).cast("bigint").alias("vq"),
        )
        .groupBy("hour")
        .agg(F.sum("vq").alias("x"))
        # checkpoint the bounded series: it feeds both the moment agg
        # and the windowed scan below — without this the raw events
        # table is scanned once per consumer (2x at 100 TB)
        .localCheckpoint(eager=True)
    )
    stats = hourly.agg(
        F.sum("x").alias("s1"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")
        ).alias("s2"),
        F.count(F.lit(1)).alias("k"),
    )
    w = Window.orderBy("hour")
    ser = (
        hourly.crossJoin(F.broadcast(stats))
        .withColumn("cum", F.sum("x").over(w))
        .withColumn("rn", F.row_number().over(w).cast("double"))
    )
    mean = F.col("s1").cast("double") / F.col("k").cast("double")
    var = (
        _dec2d("s2")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("k").cast("double")
    ) / F.col("k").cast("double")
    ser = ser.withColumn(
        "p", F.col("cum").cast("double") - F.col("rn") * mean
    ).withColumn("sd", F.sqrt(var))
    score = (F.col("p") - F.least(F.min("p").over(w), F.lit(0.0))) / F.col("sd")
    return ser.select(
        F.col("hour").cast("bigint").alias("hour"),
        F.col("x").alias("hourly_total"),
        score.alias("cusum_score"),
        (score > F.lit(5.0)).alias("is_alarm"),
    )


_Q_CUSUM_SQL = """
WITH hourly AS (
  SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
), stats AS (
  SELECT CAST(SUM(x) AS BIGINT) AS s1,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS s2,
         COUNT(*) AS k
  FROM hourly
), ser AS (
  SELECT hour, x,
         CAST(SUM(x) OVER (ORDER BY hour) AS BIGINT) AS cum,
         CAST(ROW_NUMBER() OVER (ORDER BY hour) AS DOUBLE) AS rn,
         s1, s2, k
  FROM hourly, stats
), par AS (
  SELECT hour, x,
         CAST(cum AS DOUBLE)
           - rn * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS p,
         sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
              / CAST(k AS DOUBLE)) AS sd
  FROM ser
)
SELECT hour, x AS hourly_total,
       (p - LEAST(MIN(p) OVER (ORDER BY hour), 0.0)) / sd AS cusum_score,
       ((p - LEAST(MIN(p) OVER (ORDER BY hour), 0.0)) / sd > 5.0) AS is_alarm
FROM par
"""


def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily order-revenue series (the
    "is there weekly seasonality" diagnostic a forecast consumer runs
    before trusting q_forecast_seasonal_naive).

    The raw scan collapses to one row per ORDER DAY first; the lag
    pairing is a self-equi-join of that bounded series against itself
    shifted by an exploded lag 1..7 (7·#days rows — never touches the
    orders table again). Pearson r per lag comes from exact moments:
    whole-dollar daily totals as BIGINT, cross/square products summed
    in DECIMAL (Σxy would wrap int64 past ~sf10).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr("datediff(cast(o_orderdate as date), date'1990-01-01')")
            .cast("bigint")
            .alias("day"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("v"),
        )
        .groupBy("day")
        .agg(F.sum("v").alias("x"))
        # checkpoint: daily feeds BOTH self-join branches — without it
        # the orders scan runs twice (measured 30.5 s of the sf10 cold
        # suite; the series itself is ~2400 rows)
        .localCheckpoint(eager=True)
    )
    a = daily.withColumn("lag", F.explode(F.sequence(F.lit(1), F.lit(7)))).select(
        "lag", (F.col("day") + F.col("lag")).alias("tday"), F.col("x").alias("xv")
    )
    b = daily.select(F.col("day").alias("tday"), F.col("x").alias("yv"))
    pairs = a.join(b, "tday")
    dec = lambda c: F.col(c).cast("decimal(18,0)")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(dec("xv") * dec("yv")).alias("sxy"),
        F.sum(dec("xv") * dec("xv")).alias("sxx"),
        F.sum(dec("yv") * dec("yv")).alias("syy"),
    )
    dn = F.col("n").cast("double")
    dsx, dsy = F.col("sx").cast("double"), F.col("sy").cast("double")
    dsxy = _dec2d("sxy")
    dsxx, dsyy = _dec2d("sxx"), _dec2d("syy")
    num = dn * dsxy - dsx * dsy
    den = F.sqrt((dn * dsxx - dsx * dsx) * (dn * dsyy - dsy * dsy))
    return m.select(
        F.col("lag").cast("int").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        (num / den).alias("autocorr"),
    ).orderBy("lag_days")


_Q_AUTOCORR_SQL = """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1990-01-01' AS BIGINT) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
), pairs AS (
  SELECT t.lag, a.x AS xv, b.x AS yv
  FROM daily a
  CROSS JOIN range(1, 8) t(lag)
  JOIN daily b ON b.day = a.day + t.lag
), m AS (
  SELECT lag, COUNT(*) AS n,
         CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
         SUM(CAST(xv AS DECIMAL(18,0)) * CAST(yv AS DECIMAL(18,0))) AS sxy,
         SUM(CAST(xv AS DECIMAL(18,0)) * CAST(xv AS DECIMAL(18,0))) AS sxx,
         SUM(CAST(yv AS DECIMAL(18,0)) * CAST(yv AS DECIMAL(18,0))) AS syy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS INT) AS lag_days, n AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS autocorr
FROM m ORDER BY lag_days
"""


def q_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping SLA attainment: per (order year, month, priority), the
    share of lineitems shipped within 30/60/90 days of the order date.

    One shuffle join lineitem⋈orders on the order key (AQE handles the
    build side; the bucketed-copy path in q_bucketed_join is the
    zero-Exchange alternative when the lake is bucket-copied). All
    ratios are double divisions of exact BIGINT conditional counts.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year("o_orderdate").alias("oy"),
        F.month("o_orderdate").alias("om"),
        "o_orderpriority",
        F.expr(
            "datediff(cast(l_shipdate as date), cast(o_orderdate as date))"
        ).alias("lag_days"),
    )
    n = F.count(F.lit(1))
    within = lambda d: F.sum((F.col("lag_days") <= d).cast("bigint"))
    return j.groupBy("oy", "om", "o_orderpriority").agg(
        n.alias("n_lines"),
        (within(30).cast("double") / n).alias("pct_30d"),
        (within(60).cast("double") / n).alias("pct_60d"),
        (within(90).cast("double") / n).alias("pct_90d"),
        (F.sum("lag_days").cast("double") / n).alias("avg_lag_days"),
    )


_Q_SLA_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS oy,
       CAST(month(o_orderdate) AS INT) AS om,
       o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pct_30d,
       CAST(SUM(CASE WHEN lag_days <= 60 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pct_60d,
       CAST(SUM(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pct_90d,
       CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS avg_lag_days
FROM (
  SELECT o_orderdate, o_orderpriority,
         CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
) GROUP BY 1, 2, 3
"""


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival time distribution (whole minutes
    between a user's consecutive events) — the capacity-planning view
    of stream burstiness.

    One shuffle by user_id feeds a narrow lag window (deterministic
    order ``ts, event_id`` so equal timestamps can't flip pairs across
    engines); the rest is a groupBy with exact integer moments. Gap
    squares sum in DECIMAL(19,0) — a span-of-dataset gap in minutes
    squared times sf100 row counts would wrap int64.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "event_type",
            F.expr(f"(ts - prev) div {_MIN_NS}").alias("gap_min"),
        )
    )
    n = F.count(F.lit(1))
    s1 = F.sum("gap_min")
    s2 = F.sum(
        F.col("gap_min").cast("decimal(19,0)")
        * F.col("gap_min").cast("decimal(19,0)")
    )
    dn, ds1 = n.cast("double"), s1.cast("double")
    return gaps.groupBy("event_type").agg(
        n.alias("n_gaps"),
        (ds1 / dn).alias("mean_min"),
        F.sqrt((s2.cast("string").cast("double") - ds1 * ds1 / dn) / dn).alias("sd_min"),
        F.min("gap_min").alias("min_min"),
        F.max("gap_min").alias("max_min"),
    )


_Q_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         CAST((epoch_ns(ts) - prev) // 60000000000 AS BIGINT) AS gap_min
  FROM (
    SELECT event_type, ts,
           LAG(epoch_ns(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
  ) WHERE prev IS NOT NULL
)
SELECT event_type, COUNT(*) AS n_gaps,
       CAST(SUM(gap_min) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_min,
       sqrt((CAST(CAST(SUM(CAST(gap_min AS DECIMAL(19,0))
                            * CAST(gap_min AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
             - CAST(SUM(gap_min) AS DOUBLE) * CAST(SUM(gap_min) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE))
            / CAST(COUNT(*) AS DOUBLE)) AS sd_min,
       CAST(MIN(gap_min) AS BIGINT) AS min_min,
       CAST(MAX(gap_min) AS BIGINT) AS max_min
FROM gaps GROUP BY event_type
"""


def q_hhi_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: Herfindahl index
    (Σ share²) and the top supplier's share — the procurement-risk
    report.

    HHI is a sum of SQUARED float shares, so a naive Σ share² is
    association-order dependent. Instead each supplier's revenue is
    materialized as EXACT integer micro-dollars (the decimal revenue
    has scale 6, so ×10⁶ is an exact integer), squares sum in
    DECIMAL(38,0), and HHI = Σr² / (Σr)² is one double expression over
    those exact aggregates — order-free on any cluster.

    Plan: supplier/nation broadcast into the lineitem scan, one
    groupBy to #suppliers rows, then a #nations-sized re-agg. The
    per-row revenue is PURE INT64: micro-dollars = round(price·100) ·
    (10000 − round(discount·10⁴)) — algebraically identical to the
    DECIMAL(12,2)×(1−DECIMAL(6,4)) product ×10⁶ (same exact integer),
    but long multiply stays in whole-stage codegen where Decimal128
    math measured 49 s vs ~10 s for the int form at sf10.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * F.lit(100)).cast("bigint")
            * (
                F.lit(10000)
                - F.round(F.col("l_discount") * F.lit(10000)).cast("bigint")
            )
        ).alias("rev_micro"),
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(bcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("rev_micro").alias("rev_micro"))
    )
    dec = F.col("rev_micro").cast("decimal(19,0)")
    hhi = srev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_micro").alias("total"),
        F.sum(dec * dec).alias("sumsq"),
        F.max("rev_micro").alias("top_rev"),
    )
    dt = F.col("total").cast("double")
    return hhi.join(bcast(nat), hhi.s_nationkey == nat.n_nationkey).select(
        "n_name",
        "n_suppliers",
        (_dec2d("sumsq") / (dt * dt)).alias("hhi"),
        (F.col("top_rev").cast("double") / dt).alias("top_share"),
    )


_Q_HHI_SQL = """
WITH srev AS (
  SELECT s_nationkey, s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
              AS BIGINT) AS rev_micro
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), hhi AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         CAST(SUM(rev_micro) AS BIGINT) AS total,
         SUM(CAST(rev_micro AS DECIMAL(19,0))
             * CAST(rev_micro AS DECIMAL(19,0))) AS sumsq,
         CAST(MAX(rev_micro) AS BIGINT) AS top_rev
  FROM srev GROUP BY 1
)
SELECT n_name, n_suppliers,
       CAST(CAST(sumsq AS VARCHAR) AS DOUBLE)
         / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi,
       CAST(top_rev AS DOUBLE) / CAST(total AS DOUBLE) AS top_share
FROM hhi JOIN nation ON s_nationkey = n_nationkey
"""


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between discount (basis points)
    and quantity — the "does discounting move volume" proxy.

    Built-in ``corr()`` accumulates doubles in shuffle order, so the
    coefficient comes from exact BIGINT moments instead (both factors
    are small ints: bp ≤ 10, qty ≤ 50 — no overflow at any SF). The
    part dimension broadcasts into the lineitem scan; one groupBy to
    #brands rows. Zero-variance groups yield NULL via an explicit
    guard (identical in the oracle) rather than engine-specific ±Inf.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * F.lit(100)).cast("bigint").alias("bp"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(bcast(part), li.l_partkey == part.p_partkey)
    m = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bp").alias("sd"),
        F.sum("qty").alias("sq"),
        F.sum(F.col("bp") * F.col("qty")).alias("sdq"),
        F.sum(F.col("bp") * F.col("bp")).alias("sdd"),
        F.sum(F.col("qty") * F.col("qty")).alias("sqq"),
    )
    dn = F.col("n").cast("double")
    dsd, dsq = F.col("sd").cast("double"), F.col("sq").cast("double")
    vx = dn * F.col("sdd").cast("double") - dsd * dsd
    vy = dn * F.col("sqq").cast("double") - dsq * dsq
    num = dn * F.col("sdq").cast("double") - dsd * dsq
    corr = F.when(
        (vx > F.lit(0.0)) & (vy > F.lit(0.0)), num / F.sqrt(vx * vy)
    )
    return m.select(
        "p_brand", F.col("n").alias("n_lines"), corr.alias("corr_disc_qty")
    )


_Q_ELASTICITY_SQL = """
WITH m AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(bp) AS BIGINT) AS sd, CAST(SUM(qty) AS BIGINT) AS sq,
         CAST(SUM(bp * qty) AS BIGINT) AS sdq,
         CAST(SUM(bp * bp) AS BIGINT) AS sdd,
         CAST(SUM(qty * qty) AS BIGINT) AS sqq
  FROM (
    SELECT p_brand,
           CAST(ROUND(l_discount * 100) AS BIGINT) AS bp,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
  ) GROUP BY 1
)
SELECT p_brand, n AS n_lines,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                    - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) > 0.0
             AND (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) > 0.0
            THEN (CAST(n AS DOUBLE) * CAST(sdq AS DOUBLE)
                    - CAST(sd AS DOUBLE) * CAST(sq AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                           - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))
       END AS corr_disc_qty
FROM m
"""


def q_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity over event types: Gini-Simpson
    index ``1 - Σ p_i²`` and the effective type count ``1/Σ p_i²``.

    Simpson instead of Shannon entropy ON PURPOSE (the repo-wide rule,
    see text_char_diversity / dq_drift): Shannon needs ln(), whose
    last-ulp rounding differs between the JVM's Math.log and DuckDB's
    libm — measured as a real hash break at sf0.01 during this entry's
    build. Simpson is pure integer arithmetic (Σc² exact BIGINT, c ≤ n
    per user so no overflow at any SF) with one double division at the
    end — bit-identical on any engine and any shuffle order. Two
    groupBys: raw scan → (user,type) counts → per-user fold; output is
    #users rows.
    """
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    dn, ds2 = F.col("n").cast("double"), F.col("s2").cast("double")
    return per_user.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_types"),
        (F.lit(1.0) - ds2 / (dn * dn)).alias("simpson_diversity"),
        ((dn * dn) / ds2).alias("effective_types"),
    )


_Q_DIVERSITY_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), per_user AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY 1
)
SELECT user_id, n AS n_events, k AS n_types,
       1.0 - CAST(s2 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS simpson_diversity,
       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         / CAST(s2 AS DOUBLE) AS effective_types
FROM per_user
"""


def q_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: histogram of the gap (days) between a
    customer's consecutive orders, bucketed by week (capped at 12+),
    with the mean gap and mean order value per bucket.

    One shuffle by customer feeds the lag window (order-date then
    order-key, so same-day orders pair deterministically); the
    histogram agg is exact integers.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev", F.lag("o_orderdate").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.expr(
                "datediff(cast(o_orderdate as date), cast(prev as date))"
            ).alias("gap"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("val"),
        )
        .withColumn(
            "week_bucket",
            F.least(F.expr("gap div 7").cast("bigint"), F.lit(12)).cast("int"),
        )
    )
    n = F.count(F.lit(1))
    return gaps.groupBy("week_bucket").agg(
        n.alias("n_gaps"),
        (F.sum("gap").cast("double") / n).alias("avg_gap_days"),
        (F.sum("val").cast("double") / n).alias("avg_order_value"),
    )


_Q_REPEAT_SQL = """
WITH gaps AS (
  SELECT CAST(o_orderdate AS DATE) - CAST(prev AS DATE) AS gap,
         CAST(FLOOR(o_totalprice) AS BIGINT) AS val
  FROM (
    SELECT o_orderdate, o_totalprice,
           LAG(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
    FROM orders
  ) WHERE prev IS NOT NULL
)
SELECT CAST(LEAST(gap // 7, 12) AS INT) AS week_bucket,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_days,
       CAST(SUM(val) AS DOUBLE) / COUNT(*) AS avg_order_value
FROM gaps GROUP BY 1
"""


def q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-brand price percentiles (p25/p50/p75 + min/max) over
    integer cents.

    Spark's ``percentile()`` is the EXACT sort-based aggregate (one
    shuffle to #brands groups, per-group counting sort over distinct
    cents); DuckDB's ``quantile_cont`` matches. Quartile fractions on
    integer inputs interpolate as ``a + (b-a)·f`` with f ∈ {0,.25,.5,
    .75} — exact in binary, so the doubles hash-match with no
    quantization. For unbounded-distinct columns at 100 TB the sketch
    path (sketch_hist_quantile) is the escalation; this entry is the
    exact-answer contract.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * F.lit(100)).cast("bigint").alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(bcast(part), li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").alias("pcts"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    ).select(
        "p_brand",
        "n_lines",
        F.col("pcts")[0].alias("p25"),
        F.col("pcts")[1].alias("p50"),
        F.col("pcts")[2].alias("p75"),
        "min_cents",
        "max_cents",
    )


_Q_PCTBANDS_SQL = """
WITH j AS (
  SELECT p_brand, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
), q AS (
  SELECT p_brand, COUNT(*) AS n_lines,
         quantile_cont(cents, [0.25, 0.5, 0.75]) AS pcts,
         CAST(MIN(cents) AS BIGINT) AS min_cents,
         CAST(MAX(cents) AS BIGINT) AS max_cents
  FROM j GROUP BY 1
)
SELECT p_brand, n_lines, pcts[1] AS p25, pcts[2] AS p50, pcts[3] AS p75,
       min_cents, max_cents
FROM q
"""


def q_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed hourly event volume with spike alerts.

    The EWMA recursion ``e_t = α·x_t + (1-α)·e_{t-1}`` unrolls to a
    geometrically weighted sum over the trailing window; with α = 0.25
    the 0.75^L weight is below double-ulp of any realistic count by
    L = 64, so a 64-lag truncation is numerically the full EWMA. A
    naive windowed Σ of float terms would be order-dependent AND the
    absolute-exponent trick (0.75^rn · rescale) under/overflows past
    ~2500 rows — instead each (target-hour, lag) term quantizes to
    ``floor(x·0.75^L·2^20)`` BIGINT, the per-target sum is exact
    integers in any order, and the normalizing truncated-geometric
    mass is the same quantized sum over the PRESENT lags (gaps in the
    hourly series just drop their term, matching the oracle).

    Shape: the raw scan collapses to the bounded hourly series, which
    self-joins against 64 exploded lags (64·#hours rows — series-sized,
    never table-sized). The spike flag compares x_t to 2× the PRIOR
    hour's EWMA.
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .select(F.expr(f"ts div {_HOUR_NS}").alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    ser = hourly.withColumn(
        "rn", F.row_number().over(Window.orderBy("hour")).cast("bigint")
    ).localCheckpoint(eager=True)  # feeds lag explode AND final join
    lagged = ser.withColumn(
        "L", F.explode(F.sequence(F.lit(0), F.lit(63)))
    ).select(
        (F.col("rn") + F.col("L")).alias("trn"),
        F.floor(
            F.col("x").cast("double")
            * F.pow(F.lit(0.75), F.col("L").cast("double"))
            * F.lit(1048576.0)
        ).cast("bigint").alias("termq"),
        F.floor(
            F.pow(F.lit(0.75), F.col("L").cast("double")) * F.lit(1073741824.0)
        ).cast("bigint").alias("massq"),
    )
    sums = lagged.groupBy("trn").agg(
        F.sum("termq").alias("s_term"), F.sum("massq").alias("s_mass")
    )
    ewma = (F.col("s_term").cast("double") / F.lit(1048576.0)) / (
        F.col("s_mass").cast("double") / F.lit(1073741824.0)
    )
    out = ser.join(sums, ser.rn == sums.trn).withColumn("ewma_raw", ewma)
    prior = F.lag("ewma_raw").over(Window.orderBy("rn"))
    return out.select(
        F.col("hour").cast("bigint").alias("hour"),
        F.col("x").alias("n_events"),
        F.col("ewma_raw").alias("ewma"),
        F.coalesce(
            F.col("x").cast("double") > F.lit(2.0) * prior, F.lit(False)
        ).alias("is_spike"),
    )


_Q_EWMA_SQL = """
WITH hourly AS (
  SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour,
         COUNT(*) AS x
  FROM events GROUP BY 1
), ser AS (
  SELECT hour, x,
         CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) AS rn
  FROM hourly
), lagged AS (
  SELECT rn + t.L AS trn,
         CAST(FLOOR(CAST(x AS DOUBLE) * pow(0.75, CAST(t.L AS DOUBLE))
                    * 1048576.0) AS BIGINT) AS termq,
         CAST(FLOOR(pow(0.75, CAST(t.L AS DOUBLE)) * 1073741824.0)
              AS BIGINT) AS massq
  FROM ser CROSS JOIN range(0, 64) t(L)
), sums AS (
  SELECT trn, CAST(SUM(termq) AS BIGINT) AS s_term,
         CAST(SUM(massq) AS BIGINT) AS s_mass
  FROM lagged GROUP BY 1
), sm AS (
  SELECT hour, x, rn,
         (CAST(s_term AS DOUBLE) / 1048576.0)
           / (CAST(s_mass AS DOUBLE) / 1073741824.0) AS ewma_raw
  FROM ser JOIN sums ON rn = trn
)
SELECT hour, x AS n_events, ewma_raw AS ewma,
       COALESCE(CAST(x AS DOUBLE)
                  > 2.0 * LAG(ewma_raw) OVER (ORDER BY rn),
                FALSE) AS is_spike
FROM sm
"""


QUERIES = {
    "q_events_cusum": q_events_cusum,
    "q_autocorr_daily": q_autocorr_daily,
    "q_shipping_sla": q_shipping_sla,
    "q_interarrival_stats": q_interarrival_stats,
    "q_hhi_supplier": q_hhi_supplier,
    "q_discount_elasticity": q_discount_elasticity,
    "q_user_diversity": q_user_diversity,
    "q_repeat_purchase_interval": q_repeat_purchase_interval,
    "q_percentile_bands": q_percentile_bands,
    "q_ewma_hourly": q_ewma_hourly,
}

ORACLES = {
    "q_events_cusum": _Q_CUSUM_SQL,
    "q_autocorr_daily": _Q_AUTOCORR_SQL,
    "q_shipping_sla": _Q_SLA_SQL,
    "q_interarrival_stats": _Q_INTERARRIVAL_SQL,
    "q_hhi_supplier": _Q_HHI_SQL,
    "q_discount_elasticity": _Q_ELASTICITY_SQL,
    "q_user_diversity": _Q_DIVERSITY_SQL,
    "q_repeat_purchase_interval": _Q_REPEAT_SQL,
    "q_percentile_bands": _Q_PCTBANDS_SQL,
    "q_ewma_hourly": _Q_EWMA_SQL,
}
