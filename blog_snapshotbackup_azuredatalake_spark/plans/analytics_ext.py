"""Analytics suite extension (SURVEY.md §2B) — the remaining TPC-H query
shapes adapted to the driver testdata schema: existential semi-joins,
nation-pair volume, product profit, outer-join distributions, and the
correlated-average filter. Same numeric-parity rules as
``plans.analytics`` (SURVEY.md §4): exact DECIMAL money math, doubles
only as final casts of exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.plans.analytics import (
    _price,
    _qty,
    _rev,
    _SQL_REV,
)
from blog_snapshotbackup_azuredatalake_spark.functions.hints import (
    broadcast_if_bounded as bcast,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: orders with at least one line item shipped more
    than 60 days after the order date, counted per priority. The EXISTS
    runs as a left-semi join on orderkey with the date residual — one
    shuffle, lineitem projected to two columns at the scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        line,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavor: shipping volume between a nation pair, by
    direction and ship year. supplier/customer/nation broadcast; only
    lineitem⋈orders shuffles, after both date filters prune the scans."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(bcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(bcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    line = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(bcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year, {_SQL_REV} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
      OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 flavor: revenue from 'widget' parts by supplier nation
    and order year. part filter prunes before the broadcast join, so the
    lineitem⋈orders shuffle carries only widget lines."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(bcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    line = load_table(spark, sf_dir, "lineitem")
    return (
        line.join(bcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q13_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by how many non-urgent
    orders they placed. Left outer join keeps the zero-order customers
    (the c_count = 0 bucket); the double aggregation's second shuffle is
    on the tiny (c_count) domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavor: yearly revenue lost to small orders of
    Brand#13 parts — lines with quantity under half the part's average.
    The correlated per-part average decorrelates into a pre-aggregation
    that re-broadcasts into the second scan (the agg is bounded by the
    brand's part count, tiny at any SF)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = line.join(
        bcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = brand_lines.groupBy("p_partkey").agg(
        (F.sum(_qty()).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_lines.drop("p_partkey")
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_price()).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q17_SQL = """
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), avg_qty AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM brand_lines JOIN avg_qty ON l_partkey = p_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum quarterly revenue.
    The scalar max broadcasts as a 1-row cross join against the per-
    supplier aggregate; the equality compares exact decimals, so ties
    (all of them) surface identically on any engine."""
    line = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = line.groupBy("l_suppkey").agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_rev"),
        )
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_SQL_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_rev
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 flavor: how many distinct suppliers ship each
    (brand, type, size) combination, excluding one brand, the SMALL
    type, and suppliers with negative balances (the NOT IN runs as a
    broadcast anti-join, not a per-row subquery)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "SMALL")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    # kept as the single count_distinct agg after an A/B at sf10
    # (warm min-of-2): pre-deduping (partkey, suppkey) with an extra
    # distinct shuffle before the Expand measured 16.6 s vs 13.0 s
    # for this direct form — the count_distinct Expand on slim rows
    # is cheaper than a second full shuffle
    return (
        line.join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(bcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'SMALL'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavor: suppliers who were the SOLE late shipper on
    multi-supplier orders (late = shipped >90 days after the order
    date). The original's EXISTS / NOT EXISTS pair decorrelates into
    per-order distinct-supplier counts computed as WINDOW functions over
    l_orderkey — the flagged join materializes once and the counts ride
    the same single shuffle (an agg + join-back would re-execute the
    lineitem⋈orders join for the second reference). Window partitions
    are per-order (a handful of lines each), bounded at any SF."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    flagged = line.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    # window form kept after an A/B at sf10 (warm min-of-2): the
    # "obvious" per-order hash-agg rewrite (two count_distincts + max
    # + sum, multi-distinct Expand) measured 42.1 s where this window
    # form runs 16.6 s — the Expand triples the 60 M-row stream
    # through the shuffle, costing more than the per-order sort.
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        flagged.withColumn(
            "n_supps", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "n_late_supps",
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("late")
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(
            bcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q21_SQL = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supps
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE late AND n_supps > 1 AND n_late_supps = 1
GROUP BY s_name
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass: revenue by (returnflag, status),
    by returnflag, and grand total via ROLLUP — Spark computes all three
    grouping sets in a single shuffle (Expand → one aggregate), not
    three scans. grouping_id disambiguates the NULL subtotal rows."""
    line = load_table(spark, sf_dir, "lineitem")
    return line.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 flavor: NATION_3 suppliers' share of their region's
    revenue, per order year. The share is a conditional aggregate
    (CASE inside SUM) over one scan of the joined fact — no second
    pass, no self-join; ratio computed from exact decimal sums."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(bcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(bcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "n_name", "r_name")
    )
    target_region = (
        sup.filter(F.col("n_name") == "NATION_3")
        .select("r_name")
        .limit(1)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    line = load_table(spark, sf_dir, "lineitem")
    joined = (
        line.join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(bcast(target_region), "r_name", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )),
            2,
        )
        .cast("double")
        .alias("nation_revenue"),
        F.round(F.sum(_rev()), 2).cast("double").alias("region_revenue"),
        (
            F.sum(
                F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).cast("double")
            / F.sum(_rev()).cast("double")
        ).alias("mkt_share"),
    )


_Q8_SQL = f"""
WITH sup AS (
  SELECT s_suppkey, n_name, r_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), target AS (
  SELECT r_name FROM sup WHERE n_name = 'NATION_3' LIMIT 1
)
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n_name = 'NATION_3' THEN {_SQL_REV}
                           ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
         AS nation_revenue,
       CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS region_revenue,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN {_SQL_REV}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM({_SQL_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN sup ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
WHERE r_name IN (SELECT r_name FROM target)
GROUP BY year(o_orderdate)
"""


def q_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer balance deciles: ntile(10) over a total order, per-decile
    count and decimal-exact balance stats. The (c_acctbal, c_custkey)
    sort key is unique, so tile boundaries are engine-independent. A
    global ntile needs a single-partition sort — fine for dimension
    tables; for a fact-sized quantile use approx percentiles instead."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    w = Window.orderBy("bal", "c_custkey")
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.min("bal").cast("double").alias("min_bal"),
            F.max("bal").cast("double").alias("max_bal"),
            (F.sum("bal").cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            ),
        )
    )


_Q_DECILES_SQL = """
SELECT decile, COUNT(*) AS n_custs,
       CAST(MIN(bal) AS DOUBLE) AS min_bal,
       CAST(MAX(bal) AS DOUBLE) AS max_bal,
       CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal
FROM (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
             NTILE(10) OVER (ORDER BY CAST(c_acctbal AS DECIMAL(12,2)),
                             c_custkey) AS decile
      FROM customer)
GROUP BY decile
"""

_WEEK_US = 7 * 86_400 * 1_000_000


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    week, counted in each subsequent week they returned (offsets 0–8).
    Weeks are integer epoch-week indices — pure int arithmetic, no
    calendar functions, so every engine lands on identical cohorts.
    Two shuffles: per-user min, then the (cohort, offset) count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"(ts div 1000) div {_WEEK_US}").cast("bigint").alias("wk"),
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias(
                "week_offset"
            )
        )
        .filter(F.col("week_offset") <= 8)
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_Q_RETENTION_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(epoch_ns(ts) // 1000 // {_WEEK_US} AS BIGINT) AS wk
  FROM events
), first AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
)
SELECT cohort_wk, wk - cohort_wk AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM ev JOIN first USING (user_id)
WHERE wk - cohort_wk <= 8
GROUP BY cohort_wk, week_offset
"""


def q_events_json_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull the integer `k` out of the JSON
    `props` column and aggregate it per event type — the
    parse-JSON-then-aggregate shape every event pipeline runs.
    `get_json_object` evaluates JVM-side inside codegen (no Python) and
    is null-safe on malformed rows, so the scan stays a single pass;
    only the tiny per-type aggregate shuffles. Sums stay BIGINT-exact;
    the average is one double division of exact integers (SURVEY.md
    §4)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (
            F.sum("k").cast("double") / F.count("k").cast("double")
        ).alias("avg_k"),
    )


_Q_JSON_KV_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE) AS avg_k
FROM ev GROUP BY event_type
"""


def q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 flavor (testdata has no shipmode/commitdate, so
    returnflag stands in as the ship channel and lateness is shipping
    >60 days after the order date): per channel, how many late lines
    belong to critical-priority orders vs the rest. One shuffle join
    lineitem⋈orders on orderkey — the date filter prunes the lineitem
    scan first — then conditional sums in a tiny per-flag aggregate."""
    line = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = line.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


def q_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered in 1996 but not in 1997 — the EXCEPT (set
    difference) surface. Spark's ``subtract`` is EXCEPT DISTINCT and
    plans as distinct + left-anti hash join, so only (custkey) pairs
    shuffle; the name lookup broadcasts the customer dim."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    active_96 = orders.filter(F.col("yr") == 1996).select("o_custkey")
    active_97 = orders.filter(F.col("yr") == 1997).select("o_custkey")
    lapsed = active_96.subtract(active_97)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return lapsed.join(
        bcast(cust), lapsed.o_custkey == cust.c_custkey
    ).select("c_custkey", "c_name")


_Q_LAPSED_SQL = """
WITH lapsed AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT c_custkey, c_name
FROM lapsed JOIN customer ON o_custkey = c_custkey
"""


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate): for
    every (prev_type → next_type) pair, transition count, distinct users
    making it, and the row-normalized probability. One shuffle by
    user_id for the lag window (per-user partitions are bounded at any
    SF), then an aggregate whose output is |types|² rows — the final
    window normalization runs over that tiny result, not the events.
    Probability = double division of two exact BIGINTs (portable)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").cast("bigint").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.count_distinct("user_id").alias("n_users"),
    )
    wrow = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        "n_users",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wrow).cast("double")
        ).alias("p_next"),
    )


_Q_MARKOV_SQL = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, event_id
  FROM events
), seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_type
  FROM ev
), t AS (
  SELECT prev_type, event_type AS next_type,
         COUNT(*) AS n_trans, COUNT(DISTINCT user_id) AS n_users
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_trans, n_users,
       CAST(n_trans AS DOUBLE)
         / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
         AS p_next
FROM t
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts and exact revenue across ALL 4 grouping sets of
    (orderpriority, order year) via CUBE — one Expand pass and one
    shuffle produce the full cross-dimensional summary a backup-audit
    dashboard reads (per-priority, per-year, per-cell, grand total).
    grouping_id disambiguates subtotal NULLs from data NULLs."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    return orders.cube("o_orderpriority", "o_year").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price"), 2).cast("double").alias("revenue"),
    )


_Q_CUBE_SQL = """
SELECT o_orderpriority, o_year,
       CAST(GROUPING(o_orderpriority, o_year) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(price), 2) AS DOUBLE) AS revenue
FROM (SELECT o_orderpriority,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders)
GROUP BY CUBE(o_orderpriority, o_year)
"""


def q_events_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit — the measurement that SIZES the
    watermarks every streaming operator here depends on: per event
    type, how many events arrive with an event-time earlier than the
    running max of previously-arrived events (arrival order =
    event_id), the worst lateness, and the implied watermark (whole
    minutes covering the max). One window shuffle keyed by type;
    production logs partition the window by (type, ingest shard) since
    arrival order is only meaningful within a shard."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 1000").cast("bigint").alias("ts_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.withColumn("prior_max", F.max("ts_us").over(w))
    late = F.col("prior_max").isNotNull() & (
        F.col("ts_us") < F.col("prior_max")
    )
    lateness = F.when(late, F.col("prior_max") - F.col("ts_us")).otherwise(
        F.lit(0).cast("bigint")
    )
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(late.cast("bigint")).alias("n_late"),
        (
            F.sum(late.cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("late_share"),
        F.max(lateness).alias("max_lateness_us"),
        F.ceil(F.max(lateness).cast("double") / F.lit(60_000_000.0))
        .cast("bigint")
        .alias("watermark_minutes"),
    )


_Q_DISORDER_SQL = """
WITH ev AS (
  SELECT event_type, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
         event_id
  FROM events
), seq AS (
  SELECT event_type, ts_us,
         MAX(ts_us) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prior_max
  FROM ev
), l AS (
  SELECT event_type,
         (prior_max IS NOT NULL AND ts_us < prior_max) AS late,
         CASE WHEN prior_max IS NOT NULL AND ts_us < prior_max
              THEN prior_max - ts_us ELSE 0 END AS lateness
  FROM seq
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS late_share,
       MAX(lateness) AS max_lateness_us,
       CAST(ceil(CAST(MAX(lateness) AS DOUBLE) / 60000000.0) AS BIGINT)
         AS watermark_minutes
FROM l GROUP BY event_type
"""


_DAY_US = 86_400 * 1_000_000


def q_events_continuous_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate refresh (the Timescale/materialized-rollup
    shape): a per-(day, event_type) rollup was materialized from the
    events already ingested, then a late-arriving slice (every 5th
    event_id — out-of-order arrivals that land IN OLD day buckets, not
    just at the tail) is folded in as a delta, and the refreshed
    rollup is certified bucket-by-bucket against direct recomputation.
    Decimal value sums make equality exact. At 100 TB the refresh
    touches |late| + |buckets| rows — the same never-rescan argument as
    snap_ivm, here keyed on event time."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"(ts div 1000) div {_DAY_US}").cast("bigint").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("val"),
        (F.col("event_id") % 5 == 0).alias("late"),
    )

    def roll(df: DataFrame, n: str, s: str) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias(n), F.sum("val").alias(s)
        )

    mat = roll(ev.filter(~F.col("late")), "n_mat", "s_mat")
    late = roll(ev.filter(F.col("late")), "n_late", "s_late")
    combined = mat.join(late, ["day", "event_type"], "full_outer").select(
        "day",
        "event_type",
        F.coalesce("n_mat", F.lit(0)).alias("n_mat"),
        F.coalesce("n_late", F.lit(0)).alias("n_late"),
        (
            F.coalesce("n_mat", F.lit(0)) + F.coalesce("n_late", F.lit(0))
        ).alias("n_total"),
        (
            F.coalesce(F.col("s_mat"), F.lit(0))
            + F.coalesce(F.col("s_late"), F.lit(0))
        ).alias("s_total"),
    )
    direct = roll(ev, "n_direct", "s_direct")
    out = combined.join(direct, ["day", "event_type"])
    return out.select(
        "day",
        "event_type",
        "n_mat",
        "n_late",
        "n_total",
        "n_direct",
        F.col("s_total").cast("double").alias("sum_total"),
        F.col("s_direct").cast("double").alias("sum_direct"),
        (
            (F.col("n_total") == F.col("n_direct"))
            & (F.col("s_total") == F.col("s_direct"))
        ).alias("is_consistent"),
    )


_Q_CONT_AGG_SQL = f"""
WITH ev AS (
  SELECT CAST(epoch_ns(ts) // 1000 // {_DAY_US} AS BIGINT) AS day,
         event_type,
         CAST(value AS DECIMAL(18,6)) AS val,
         event_id % 5 = 0 AS late
  FROM events
), mat AS (
  SELECT day, event_type, COUNT(*) AS n_mat, SUM(val) AS s_mat
  FROM ev WHERE NOT late GROUP BY day, event_type
), late_agg AS (
  SELECT day, event_type, COUNT(*) AS n_late, SUM(val) AS s_late
  FROM ev WHERE late GROUP BY day, event_type
), combined AS (
  SELECT day, event_type,
         COALESCE(n_mat, 0) AS n_mat,
         COALESCE(n_late, 0) AS n_late,
         COALESCE(n_mat, 0) + COALESCE(n_late, 0) AS n_total,
         COALESCE(s_mat, 0) + COALESCE(s_late, 0) AS s_total
  FROM mat FULL OUTER JOIN late_agg USING (day, event_type)
), direct AS (
  SELECT day, event_type, COUNT(*) AS n_direct, SUM(val) AS s_direct
  FROM ev GROUP BY day, event_type
)
SELECT day, event_type, n_mat, n_late, n_total, n_direct,
       CAST(s_total AS DOUBLE) AS sum_total,
       CAST(s_direct AS DOUBLE) AS sum_direct,
       (n_total = n_direct AND s_total = s_direct) AS is_consistent
FROM combined JOIN direct USING (day, event_type)
"""


def q_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly totals (decimal-exact),
    then a lag window over the AGGREGATED series — the window runs on
    |years| rows, so the single-partition global sort that would be a
    red flag on raw data is free here (aggregate first, window the
    aggregate; the raw table meets only one hash shuffle). Growth is a
    double division of two exact decimals — bit-portable."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
    )
    w = Window.orderBy("o_year")
    return (
        yearly.withColumn("prev_rev", F.lag("rev").over(w))
        .select(
            "o_year",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            F.col("prev_rev").cast("double").alias("prev_revenue"),
            (
                (F.col("rev").cast("double") - F.col("prev_rev").cast("double"))
                / F.col("prev_rev").cast("double")
            ).alias("yoy_growth"),
        )
    )


_Q_YOY_SQL = """
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY o_year
), lagged AS (
  SELECT o_year, n_orders, rev,
         LAG(rev) OVER (ORDER BY o_year) AS prev_rev
  FROM yearly
)
SELECT o_year, n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(prev_rev AS DOUBLE) AS prev_revenue,
       (CAST(rev AS DOUBLE) - CAST(prev_rev AS DOUBLE))
         / CAST(prev_rev AS DOUBLE) AS yoy_growth
FROM lagged
"""


_HOUR_US = 3_600 * 1_000_000


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with carry-forward: the dense-grid shape
    every monitoring / feature-engineering pipeline needs (a model fed
    hourly aggregates cannot tolerate missing hours). Per event_type:
    hourly (count, avg value) observations, a dense hour grid
    materialized from the aggregate's own [min, max] bounds via
    ``sequence`` (grid size = time range, INDEPENDENT of row count —
    the explode runs on |event_type| rows, not the raw table), then
    last-observation-carried-forward via an ignore-nulls last() window.
    The raw table meets exactly one shuffle (the hourly groupBy); the
    window runs over the tiny dense grid. Sums are DECIMAL-exact before
    the final double division so the carried value is bit-portable
    (SURVEY.md §4). ``fill_distance`` (hours since last observation)
    makes staleness audit-able as data."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"(ts div 1000) div {_HOUR_US}").cast("bigint").alias("hr"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("val"),
    )
    obs = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("val").alias("s")
    )
    bounds = obs.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    j = grid.join(obs, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hourly_avg = F.col("s").cast("double") / F.col("n_events")
    src_hr = F.last(
        F.when(F.col("n_events").isNotNull(), F.col("hr")), ignorenulls=True
    ).over(w)
    return j.select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
        F.last(hourly_avg, ignorenulls=True).over(w).alias("filled_avg_value"),
        (F.col("hr") - src_hr).alias("fill_distance"),
    )


_Q_GAP_FILL_SQL = f"""
WITH ev AS (
  SELECT CAST(epoch_ns(ts) // 1000 // {_HOUR_US} AS BIGINT) AS hr,
         event_type, CAST(value AS DECIMAL(18,6)) AS val
  FROM events
), obs AS (
  SELECT event_type, hr, COUNT(*) AS n_events, SUM(val) AS s
  FROM ev GROUP BY event_type, hr
), bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM obs GROUP BY event_type
), grid AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM bounds
), j AS (
  SELECT g.event_type, g.hr, o.n_events, o.s
  FROM grid g LEFT JOIN obs o ON o.event_type = g.event_type AND o.hr = g.hr
)
SELECT event_type, hr, COALESCE(n_events, 0) AS n_events,
       n_events IS NULL AS is_gap,
       last_value(CAST(s AS DOUBLE) / n_events IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_avg_value,
       hr - last_value(CASE WHEN n_events IS NOT NULL THEN hr END IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS fill_distance
FROM j
"""


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to hourly OHLC bars (open/high/low/close +
    exact average) per event type — the classic hypertable rollup every
    monitoring store ships. The scale-critical choice is ``min_by`` /
    ``max_by`` with a (ts, event_id) struct key instead of a
    ``row_number`` window: a window that exists only to pick one row per
    key sorts the whole relation (super-linear under spill), while the
    argmax aggregate is a hash agg with map-side partials — the raw
    table meets exactly ONE shuffle (SURVEY.md §6 "argmax in
    disguise"). event_id breaks ts ties so the pick is deterministic.
    open/high/low/close carry raw parquet doubles (no arithmetic →
    bit-portable); the average is a DECIMAL-exact sum divided once at
    the end (§4)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"(ts div 1000) div {_HOUR_US}").cast("bigint").alias("hr"),
        "event_type",
        "event_id",
        F.col("ts").alias("tsn"),
        F.col("value").alias("val"),
        F.col("value").cast("decimal(18,6)").alias("dval"),
    )
    return ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("val", F.struct("tsn", "event_id")).alias("open_val"),
        F.max_by("val", F.struct("tsn", "event_id")).alias("close_val"),
        F.max("val").alias("high_val"),
        F.min("val").alias("low_val"),
        (F.sum("dval").cast("double") / F.count(F.lit(1))).alias("avg_val"),
    )


_Q_OHLC_SQL = f"""
WITH ev AS (
  SELECT CAST(epoch_ns(ts) // 1000 // {_HOUR_US} AS BIGINT) AS hr,
         event_type, value AS val,
         CAST(value AS DECIMAL(18,6)) AS dval,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, epoch_ns(ts) // 1000 // {_HOUR_US}
           ORDER BY epoch_ns(ts), event_id) AS rn_a,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, epoch_ns(ts) // 1000 // {_HOUR_US}
           ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hr,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn_a = 1 THEN val END) AS open_val,
       MAX(CASE WHEN rn_d = 1 THEN val END) AS close_val,
       MAX(val) AS high_val,
       MIN(val) AS low_val,
       CAST(SUM(dval) AS DOUBLE) / COUNT(*) AS avg_val
FROM ev GROUP BY event_type, hr
"""


def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via the VARIANT type (Spark 4):
    ``parse_json`` once into a binary variant column, then typed
    ``variant_get`` paths — the modern lakehouse path for JSON-ish
    payloads. Versus ``q_events_json_kv``'s ``get_json_object``
    (string re-parse per extraction), VARIANT parses once and each
    path extraction walks the binary encoding — the difference between
    O(paths × parse) and O(parse + paths) per row, which is the whole
    game when a 100 TB event table carries 20-field payloads. Output:
    per-type stats over the extracted integer k."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k.cast("bigint")).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.count_distinct(k).alias("k_distinct"),
    )


_Q_VARIANT_SQL = """
WITH ev AS (
  SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max,
       COUNT(DISTINCT k) AS k_distinct
FROM ev GROUP BY event_type
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the hand-picked subtotal list a report
    actually wants, cheaper than CUBE's full lattice: (priority ×
    status), (status), and grand total, skipping the (priority)-only
    rollup nobody reads. Still ONE Expand pass and one shuffle (each
    input row replicates once per set — 3× here vs CUBE's 4×);
    grouping_id separates subtotal NULLs from data NULLs. At 100 TB the
    saving is proportional to the pruned sets: Expand happens BEFORE
    the shuffle, so every skipped set is a full input's worth of
    shuffle bytes."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    return orders.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price"), 2).cast("double").alias("revenue"),
    )


_Q_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(price), 2) AS DOUBLE) AS revenue
FROM (SELECT o_orderpriority, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders)
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderstatus), ())
"""


_DAY_US = 86_400 * 1_000_000
PATH_TOP_N = 20


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing/churn cut:
    per customer recency (last order epoch-day — integer arithmetic,
    no calendar functions, §4), frequency (order count), monetary
    (decimal-exact spend), each quartiled by ntile(4) over a UNIQUE
    (metric, custkey) sort so tile boundaries are engine-independent
    (the q_balance_deciles rule). Output is the 64-cell segment grid
    with counts and spend — customer-dimension-sized end to end: one
    orders shuffle to fold per-customer stats, then three window
    passes over the customer relation (global ntile needs one sorted
    partition — fine for dimensions; never do this on a fact table)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).cast("bigint").alias("day"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("decimal(18,2)").alias("monetary"),
    )
    wr = Window.orderBy("last_day", "o_custkey")
    wf = Window.orderBy("n_orders", "o_custkey")
    wm = Window.orderBy("monetary", "o_custkey")
    scored = per_cust.select(
        "o_custkey",
        "monetary",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("total_spend"),
    )


_Q_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT))
           AS last_day,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, monetary,
         NTILE(4) OVER (ORDER BY last_day, o_custkey) AS r_quartile,
         NTILE(4) OVER (ORDER BY n_orders, o_custkey) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
  FROM per_cust
)
SELECT r_quartile, f_quartile, m_quartile, COUNT(*) AS n_customers,
       CAST(SUM(monetary) AS DOUBLE) AS total_spend
FROM scored GROUP BY r_quartile, f_quartile, m_quartile
"""


def q_events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event trigrams — the clickstream path-mining primitive
    (which 3-step journeys dominate): per user, events ordered by the
    unique (ts, event_id) key, consecutive triples via two lead()
    passes over ONE window sort, then a global count + top-{PATH_TOP_N}
    with a (count, path) deterministic tiebreak. The window partitions
    by user — per-partition state is one user's events, so the sort
    parallelizes over users and no global sort exists; the count
    shuffle carries |distinct trigram| rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("third"),
    ).filter(F.col("third").isNotNull())
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.select(
            F.row_number().over(wr).cast("int").alias("rank"), "path", "n"
        )
        .filter(F.col("rank") <= PATH_TOP_N)
    )


_Q_USER_PATHS_SQL = f"""
WITH ordered AS (
  SELECT event_type,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), counts AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
  FROM ordered WHERE e3 IS NOT NULL GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT) AS rank,
       path, n
FROM counts QUALIFY rank <= {PATH_TOP_N}
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase event is credited to the
    user's most recent PRIOR non-purchase event — the marketing-
    attribution primitive (which touchpoint closes?). One window per
    user ordered by the unique (ts, event_id) key; the carried state is
    an ignore-nulls last() of a (type, ts) struct over the preceding
    frame, so the plan is a single per-user sort with O(1) state — no
    self-join of events against events (the naive formulation), and
    purchases with no prior touch land in an explicit '(none)' bucket
    rather than vanishing. Latencies fold as exact epoch-micro BIGINTs
    (sum div count, §4)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").cast("bigint").alias("ts_us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touched = ev.withColumn(
        "touch",
        F.last(
            F.when(
                F.col("event_type") != "purchase",
                F.struct(
                    F.col("event_type").alias("t"),
                    F.col("ts_us").alias("us"),
                ),
            ),
            ignorenulls=True,
        ).over(w),
    ).filter(F.col("event_type") == "purchase")
    return (
        touched.select(
            F.coalesce(F.col("touch.t"), F.lit("(none)")).alias(
                "attributed_type"
            ),
            (F.col("ts_us") - F.col("touch.us")).alias("gap_us"),
        )
        .groupBy("attributed_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("gap_us").alias("total_gap_us"),
            F.expr("sum(gap_us) div count(gap_us)").alias("avg_gap_us"),
        )
    )


_Q_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
  FROM events
), touched AS (
  SELECT event_type, ts_us,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN struct_pack(t := event_type, us := ts_us)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch
  FROM ev
)
SELECT COALESCE(touch.t, '(none)') AS attributed_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(ts_us - touch.us) AS BIGINT) AS total_gap_us,
       CAST(SUM(ts_us - touch.us) // COUNT(ts_us - touch.us) AS BIGINT)
         AS avg_gap_us
FROM touched WHERE event_type = 'purchase'
GROUP BY COALESCE(touch.t, '(none)')
"""


_HOUR_US = 3_600 * 1_000_000


def q_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every real
    forecaster must beat, as an engine primitive: predict each
    (event_type, hour) of the LAST day in the data by the same hour of
    the previous day, and score MAE per type. Money-free integer
    pipeline: hourly actuals fold as floor-cents BIGINTs (never
    ROUND, §4), days/hours are pure epoch-int arithmetic, missing
    hours on either side default to 0 via conditional aggregation over
    the two day slices (COUNT/SUM over CASE day=T vs day=T−1 — the
    same grid a full-outer join of the slices would produce, in one
    pass). The as-of day T = max(day) is a global window max over the
    HOURLY GRID, not a driver-side collect: the grid is bounded by
    construction (event types × hours of history — it grows with the
    calendar, not the corpus), so the single-partition window exchange
    moves kilobytes while the events scan happens exactly once in the
    executed plan. A broadcast-scalar crossJoin (q_order_aging's
    pattern) would also avoid the collect but re-scans the narrow asof
    branch; the window form is structurally single-scan
    (diag_plan_audit guards it)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"(ts div 1000) div {_DAY_US}").cast("bigint").alias("day"),
        F.expr(f"((ts div 1000) div {_HOUR_US}) % 24")
        .cast("int")
        .alias("hour"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    hourly = ev.groupBy("event_type", "day", "hour").agg(
        F.sum("cents").alias("actual_cents")
    )
    j = (
        hourly.withColumn(
            "t", F.max("day").over(Window.partitionBy())
        )
        .filter(F.col("day") >= F.col("t") - 1)
        .groupBy("event_type", "hour")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("day") == F.col("t"), F.col("actual_cents"))
                ),
                F.lit(0),
            ).alias("a"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("day") == F.col("t") - 1, F.col("actual_cents")
                    )
                ),
                F.lit(0),
            ).alias("p"),
        )
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("a").alias("actual_total_cents"),
        F.sum("p").alias("pred_total_cents"),
        F.sum(F.abs(F.col("a") - F.col("p"))).alias("abs_err_cents"),
        F.expr("sum(abs(a - p)) div count(1)").alias("mae_cents"),
    )


_Q_SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000 // {_DAY_US} AS BIGINT) AS day,
         CAST((epoch_ns(ts) // 1000 // {_HOUR_US}) % 24 AS INT) AS hour,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS actual_cents
  FROM events GROUP BY 1, 2, 3
), last_day AS (SELECT MAX(day) AS d FROM hourly),
test AS (
  SELECT event_type, hour, actual_cents FROM hourly, last_day
  WHERE day = d
), train AS (
  SELECT event_type, hour, actual_cents AS pred_cents FROM hourly, last_day
  WHERE day = d - 1
), j AS (
  SELECT COALESCE(test.event_type, train.event_type) AS event_type,
         COALESCE(actual_cents, 0) AS a, COALESCE(pred_cents, 0) AS p
  FROM test FULL OUTER JOIN train
    ON test.event_type = train.event_type AND test.hour = train.hour
)
SELECT event_type, COUNT(*) AS n_hours,
       CAST(SUM(a) AS BIGINT) AS actual_total_cents,
       CAST(SUM(p) AS BIGINT) AS pred_total_cents,
       CAST(SUM(abs(a - p)) AS BIGINT) AS abs_err_cents,
       CAST(SUM(abs(a - p)) // COUNT(*) AS BIGINT) AS mae_cents
FROM j GROUP BY event_type
"""


# customer value-migration thresholds (annual spend, integer cents).
# Fixed cuts, NOT ntile: per-customer annual spend is distribution-
# stable across SF (more customers, same distribution), so fixed
# thresholds avoid the global sort exact deciles need.
MIGRATION_CUTS_CENTS = (25_000_000, 50_000_000)  # $250k / $500k
MIGRATION_Y1, MIGRATION_Y2 = 1996, 1997


def q_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-migration matrix: spend tier in {MIGRATION_Y1} ×
    tier in {MIGRATION_Y2} → customer counts (the churn/upsell BI
    view). Tiers are fixed integer-cent thresholds on annual spend
    (floor(price·100) — floor of identically-computed doubles is exact
    in both engines, SURVEY §4; Spark's double→BIGINT cast truncates
    while DuckDB's rounds, so never bare-cast). Customers inactive in a
    year land in tier 'none'. Two shuffles: (custkey, year) spend agg,
    then the 16-cell matrix count."""
    lo, hi = MIGRATION_CUTS_CENTS
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).filter(F.col("yr").isin(MIGRATION_Y1, MIGRATION_Y2))
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("yr") == MIGRATION_Y1, F.col("cents"))
        ).alias("s1"),
        F.sum(
            F.when(F.col("yr") == MIGRATION_Y2, F.col("cents"))
        ).alias("s2"),
    )

    def tier(c: Column) -> Column:
        return (
            F.when(c.isNull(), F.lit("none"))
            .when(c < lo, F.lit("low"))
            .when(c < hi, F.lit("mid"))
            .otherwise(F.lit("high"))
        )

    return (
        spend.select(
            tier(F.col("s1")).alias("tier_from"),
            tier(F.col("s2")).alias("tier_to"),
        )
        .groupBy("tier_from", "tier_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


_Q_MIGRATION_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         SUM(CASE WHEN year(o_orderdate) = {MIGRATION_Y1}
                  THEN CAST(floor(o_totalprice * 100) AS BIGINT) END)
           AS s1,
         SUM(CASE WHEN year(o_orderdate) = {MIGRATION_Y2}
                  THEN CAST(floor(o_totalprice * 100) AS BIGINT) END)
           AS s2
  FROM orders
  WHERE year(o_orderdate) IN ({MIGRATION_Y1}, {MIGRATION_Y2})
  GROUP BY o_custkey
)
SELECT CASE WHEN s1 IS NULL THEN 'none'
            WHEN s1 < {MIGRATION_CUTS_CENTS[0]} THEN 'low'
            WHEN s1 < {MIGRATION_CUTS_CENTS[1]} THEN 'mid'
            ELSE 'high' END AS tier_from,
       CASE WHEN s2 IS NULL THEN 'none'
            WHEN s2 < {MIGRATION_CUTS_CENTS[0]} THEN 'low'
            WHEN s2 < {MIGRATION_CUTS_CENTS[1]} THEN 'mid'
            ELSE 'high' END AS tier_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM spend GROUP BY 1, 2
"""


def q_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: at the as-of day T = max(o_orderdate),
    orders not yet fully shipped (close = max line shipdate > T) are
    bucketed by age (T − open day: 0-29 / 30-59 / 60-89 / 90+) per
    priority — the ops review behind q_order_backlog's curve. The
    as-of day is a single-row aggregate broadcast into the filter;
    close days reuse the per-order max-shipdate agg; the report is
    |buckets|×|priorities| rows."""
    open_day = F.expr(_EPOCH_DAY.format(c="o_orderdate"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", open_day.alias("open_day")
    )
    close = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(F.expr(_EPOCH_DAY.format(c="l_shipdate"))).alias(
                "close_day"
            )
        )
    )
    asof = orders.agg(F.max("open_day").alias("t"))
    aged = (
        orders.join(close, orders.o_orderkey == close.l_orderkey)
        .crossJoin(F.broadcast(asof))
        .filter(F.col("close_day") > F.col("t"))
        .select(
            "o_orderpriority",
            (F.col("t") - F.col("open_day")).alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") < 30, F.lit("00-29"))
        .when(F.col("age_days") < 60, F.lit("30-59"))
        .when(F.col("age_days") < 90, F.lit("60-89"))
        .otherwise(F.lit("90+"))
    )
    return (
        aged.select(
            bucket.alias("age_bucket"),
            F.col("o_orderpriority").alias("priority"),
        )
        .groupBy("age_bucket", "priority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


_Q_AGING_SQL = """
WITH orders_d AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS open_day
  FROM orders
), close AS (
  SELECT l_orderkey,
         MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS close_day
  FROM lineitem GROUP BY l_orderkey
), asof_t AS (SELECT MAX(open_day) AS t FROM orders_d),
aged AS (
  SELECT o_orderpriority, t - open_day AS age_days
  FROM orders_d JOIN close ON l_orderkey = o_orderkey
  CROSS JOIN asof_t
  WHERE close_day > t
)
SELECT CASE WHEN age_days < 30 THEN '00-29'
            WHEN age_days < 60 THEN '30-59'
            WHEN age_days < 90 THEN '60-89'
            ELSE '90+' END AS age_bucket,
       o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM aged GROUP BY 1, 2
"""


SLIDING_DAU_DAYS = 7


def q_events_sliding_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {SLIDING_DAU_DAYS}-day distinct active users per day (the
    DAU/WAU board metric). A sliding DISTINCT does not decompose into a
    running sum — a user active on 3 of the 7 days still counts once —
    so the exact form re-counts: the raw table reduces to DISTINCT
    (day, user) pairs in its single shuffle, then the day grid joins
    pairs within its trailing window. Every post-shuffle relation is
    calendar × user-base bounded, NOT event-volume bounded; the grid
    side is |days| rows, so the range join plans as a broadcast nested
    loop over a provably tiny build side. At unbounded user cardinality
    the sketch path is sketch_hll_grouped."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr(f"(ts div 1000) div {_DAY_US}")
            .cast("bigint")
            .alias("day"),
            "user_id",
        )
        .distinct()
    )
    days = ev.select("day").distinct()
    j = days.alias("g").join(
        ev.alias("e"),
        (F.col("e.day") <= F.col("g.day"))
        & (F.col("e.day") > F.col("g.day") - SLIDING_DAU_DAYS),
    )
    return (
        j.groupBy(F.col("g.day").alias("day"))
        .agg(
            F.count_distinct(
                F.when(F.col("e.day") == F.col("g.day"), F.col("user_id"))
            ).alias("dau"),
            F.count_distinct("user_id").alias("dau7"),
        )
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("dau7").cast("bigint").alias("dau7"),
        )
    )


_Q_SLIDING_DAU_SQL = f"""
WITH ev AS (
  SELECT DISTINCT CAST(epoch_ns(ts) // 1000 // {_DAY_US} AS BIGINT)
           AS day, user_id
  FROM events
), days AS (SELECT DISTINCT day FROM ev)
SELECT g.day,
       CAST(COUNT(DISTINCT CASE WHEN e.day = g.day THEN user_id END)
            AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau7
FROM days g JOIN ev e
  ON e.day <= g.day AND e.day > g.day - {SLIDING_DAU_DAYS}
GROUP BY g.day
"""

_EPOCH_DAY = "datediff(cast({c} as date), date'1970-01-01')"


def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog as an event-sourced running balance:
    each order contributes +1 on its open day (o_orderdate) and -1 on
    its close day (max l_shipdate of its lines); backlog(d) = opens ≤ d
    minus closes ≤ d (an order closing during d counts closed at d's
    end). The raw tables meet two shuffles (per-order close agg, then
    the orderkey-co-partitioned join with orders that AQE plans once);
    the running-sum window covers only DISTINCT delta days — bounded by
    the calendar (~2.4 k days at every SF), not by row count — so the
    single-partition window is safe at 100 TB, same argument as
    q_gap_fill's grid."""
    open_day = F.expr(_EPOCH_DAY.format(c="o_orderdate")).alias("open_day")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", open_day
    )
    close = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(F.expr(_EPOCH_DAY.format(c="l_shipdate"))).alias(
                "close_day"
            )
        )
    )
    spans = orders.join(
        close, orders.o_orderkey == close.l_orderkey
    ).select("open_day", "close_day")
    deltas = (
        spans.select(
            F.col("open_day").alias("day"),
            F.lit(1).alias("opened"),
            F.lit(0).alias("closed"),
        )
        .unionAll(
            spans.select(
                F.col("close_day").alias("day"),
                F.lit(0).alias("opened"),
                F.lit(1).alias("closed"),
            )
        )
        .groupBy("day")
        .agg(F.sum("opened").alias("opened"), F.sum("closed").alias("closed"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        F.col("day").cast("int").alias("day"),
        F.col("opened").cast("bigint").alias("opened"),
        F.col("closed").cast("bigint").alias("closed"),
        F.sum(F.col("opened") - F.col("closed"))
        .over(w)
        .cast("bigint")
        .alias("backlog"),
    )


_Q_BACKLOG_SQL = """
WITH close AS (
  SELECT l_orderkey,
         MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS close_day
  FROM lineitem GROUP BY l_orderkey
), spans AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS open_day,
         close_day
  FROM orders JOIN close ON l_orderkey = o_orderkey
), deltas AS (
  SELECT day, SUM(opened) AS opened, SUM(closed) AS closed FROM (
    SELECT open_day AS day, 1 AS opened, 0 AS closed FROM spans
    UNION ALL
    SELECT close_day AS day, 0 AS opened, 1 AS closed FROM spans
  ) GROUP BY day
)
SELECT CAST(day AS INT) AS day,
       CAST(opened AS BIGINT) AS opened,
       CAST(closed AS BIGINT) AS closed,
       CAST(SUM(opened - closed) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS backlog
FROM deltas
"""

LATE_SHIP_DAYS = 60


def q_supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment lead time per supplier nation: order-to-ship days per
    line, reported as floor fixed-point milli-days plus a late share in
    ppm (> {LATE_SHIP_DAYS} days). lineitem⋈orders is the one real
    shuffle (orderkey-co-partitioned fact join); supplier and nation
    broadcast; integer arithmetic end-to-end (floor fixed-point, never
    ROUND — SURVEY §4)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(_EPOCH_DAY.format(c="l_shipdate")).alias("ship_day"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_EPOCH_DAY.format(c="o_orderdate")).alias("open_day")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(bcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(bcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            (F.col("ship_day") - F.col("open_day"))
            .cast("bigint")
            .alias("lead_days"),
        )
    )
    agg = j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum("lead_days").alias("sum_lead"),
        F.sum(
            F.when(F.col("lead_days") > LATE_SHIP_DAYS, 1).otherwise(0)
        ).alias("late"),
    )
    return agg.select(
        F.col("n_name").alias("nation"),
        F.col("lines").cast("bigint").alias("lines"),
        F.expr("sum_lead * 1000 div lines").cast("bigint").alias(
            "avg_lead_md"
        ),
        F.expr("late * 1000000 div lines").cast("bigint").alias(
            "late_ppm"
        ),
    )


_Q_LEAD_TIME_SQL = f"""
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS lines,
       CAST(SUM(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE))
            * 1000 // COUNT(*) AS BIGINT) AS avg_lead_md,
       CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE)
                          - CAST(o_orderdate AS DATE)
                          > {LATE_SHIP_DAYS} THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS late_ppm
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_order_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle — the retention-economics report
    every subscription/commerce analytics stack ships: customers are
    grouped by FIRST-order month (the cohort), and revenue folds per
    (cohort month, months-since-first) cell. Month index is pure
    integer calendar arithmetic (year·12 + month − 1 — identical in
    both engines, no epoch division drift); revenue folds as
    floor-cents BIGINTs (o_totalprice is a raw double; a double SUM
    would be fold-order-dependent, §4). Two shuffles: the per-customer
    min (map-side combinable) and the cohort-cell fold after a
    shuffle join back on custkey — the standard cohort plan at any
    scale; output is a bounded months×ages triangle."""
    mo = "year(o_orderdate) * 12 + month(o_orderdate) - 1"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(mo).cast("bigint").alias("m"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cohort = orders.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        orders.join(cohort, "o_custkey")
        .groupBy(
            F.col("m0").alias("cohort_month"),
            (F.col("m") - F.col("m0")).alias("month_age"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


_Q_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), cohort AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY o_custkey)
SELECT m0 AS cohort_month, m - m0 AS month_age,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM o JOIN cohort USING (o_custkey)
GROUP BY 1, 2
"""


# log2 buckets as a generated integer CASE chain: floor(log2(n)) via
# double log diverges at exact powers of two (ln(8)/ln(2) can land at
# 2.9999999999999996), so the bucket edges are integer comparisons —
# identical in both engines, codegen-friendly.
_POW2_MAX = 24


def _log2_bucket_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} >= {1 << b} THEN {b}"
        for b in range(_POW2_MAX, 0, -1)
    )
    return f"CASE {cases} ELSE 0 END"


def q_events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration histogram: per-user event counts folded
    into log2 buckets — the one-page answer to "is the event stream a
    few power users or a broad base", the skew diagnostic run before
    any per-user shuffle is sized. Per-user fold is map-side
    combinable; the histogram fold runs on the user-count-sized
    relation; output is ≤ {_POW2_MAX}+1 rows at any scale. Bucket
    edges are integer CASE comparisons, not floor(log2) doubles (the
    power-of-two boundary is exactly where libm log diverges)."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    bucketed = per_user.select(
        F.expr(_log2_bucket_sql("n")).cast("int").alias("log2_bucket"),
        "n",
    )
    total = bucketed.groupBy().agg(F.sum("n").alias("n_total"))
    return (
        bucketed.groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "log2_bucket",
            "n_users",
            "n_events",
            F.expr(
                "n_events * 1000000 div greatest(n_total, 1L)"
            ).alias("events_share_ppm"),
        )
    )


def _q_power_users_sql() -> str:
    return f"""
WITH per_user AS (SELECT user_id, COUNT(*) AS n FROM events
                  GROUP BY user_id),
bucketed AS (SELECT CAST({_log2_bucket_sql("n")} AS INT) AS log2_bucket, n
             FROM per_user),
total AS (SELECT SUM(n) AS n_total FROM bucketed)
SELECT log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(n) * 1000000 // GREATEST((SELECT n_total FROM total), 1)
            AS BIGINT) AS events_share_ppm
FROM bucketed GROUP BY log2_bucket
"""


BASKET_MIN_SUPPORT = 3  # pair must co-occur in ≥ this many orders
BASKET_TOP_K = 20


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top {BASKET_TOP_K} part pairs by LIFT
    (P(u,v)/P(u)P(v)) with a support floor — the co-purchase
    recommendation primitive. Pair counts come from the bounded
    order-key self-join (order size ≤ 7 in this schema, so fanout is a
    small constant — the graph substrate's edge shape, with counts);
    lift divides identical integers in both engines so the double is
    bit-portable, and the top-K is a fully-ordered (lift DESC, u, v)
    limit — Spark executes it as distributed TakeOrdered, never a
    global sort materialization."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # ONE shuffle folds the fact scan to per-order sorted part-id
    # arrays (collect_set dedups, so no separate distinct pass), then
    # a checkpoint makes the order-sized relation the shared substrate
    # for all three consumers. The prior form self-joined the 60 M-row
    # (order, part) relation and recomputed scan+distinct once PER
    # CONSUMER (4 fact scans). Warm min-of-2 A/B at sf10: 33.6 s old
    # vs 31.4 s here — a wash on a page-cached single box, but the
    # 4×→1× scan count is the term that dominates on a real cluster
    # reading 100 TB of cold parquet. Pairs come from array lambdas
    # over the ≤7-item baskets (≤21 pairs/order, u < v free from the
    # sorted array), the cooccurrence rewrite's pattern.
    orders_g = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=True)
    )
    n_ord = orders_g.groupBy().agg(F.count(F.lit(1)).alias("n_orders"))
    part_cnt = orders_g.select(
        F.explode("parts").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    pair_arr = F.expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x as u, y as v))))"""
    )
    pairs = (
        orders_g.select(F.explode(pair_arr).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_SUPPORT)
    )
    cu = part_cnt.select(F.col("l_partkey").alias("u"), F.col("cnt").alias("n_u"))
    cv = part_cnt.select(F.col("l_partkey").alias("v"), F.col("cnt").alias("n_v"))
    scored = (
        pairs.join(cu, "u")
        .join(cv, "v")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "u",
            "v",
            "n_both",
            "n_u",
            "n_v",
            (
                F.col("n_both").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("n_u") * F.col("n_v")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("u"), F.asc("v")
    ).limit(BASKET_TOP_K)


_Q_BASKET_SQL = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
part_cnt AS (SELECT l_partkey, COUNT(*) AS cnt FROM baskets
             GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n_both
  FROM baskets a JOIN baskets b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
)
SELECT u, v, CAST(n_both AS BIGINT) AS n_both,
       CAST(cu.cnt AS BIGINT) AS n_u, CAST(cv.cnt AS BIGINT) AS n_v,
       CAST(n_both AS DOUBLE) * CAST((SELECT n_orders FROM n_ord) AS DOUBLE)
         / CAST(cu.cnt * cv.cnt AS DOUBLE) AS lift
FROM pairs
JOIN part_cnt cu ON cu.l_partkey = u
JOIN part_cnt cv ON cv.l_partkey = v
ORDER BY lift DESC, u, v
LIMIT {BASKET_TOP_K}
"""


# ---------------------------------------------------------------------------
# revenue concentration (Pareto bands)
# ---------------------------------------------------------------------------


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration as a banded Pareto report: each
    customer's lifetime revenue (exact DECIMAL cents) is bucketed by
    its decimal magnitude (digit count of the cents total — an exact
    integer band, no logs), and each band reports customer count, band
    revenue, and the cumulative revenue share in ppm from the richest
    band down. The classic Pareto curve needs a TOTAL order over
    customers — a single-partition window over every customer, which
    dies at 100 TB; banding first caps the ordered set at ~15 rows
    (digit counts of a bigint), so the cumulative window is O(1)
    regardless of customer count. Revenue agg is one orderkey→custkey
    shuffle pair; ppm is integer fixed-point (`div`), never a float
    ratio, so the hash matches any engine bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _rev().alias("rev")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
        .select(
            # explicit floor: a bare decimal->bigint cast truncates on
            # some engines and rounds on others
            F.floor(F.col("rev") * 100).cast("bigint").alias("cents")
        )
        .filter(F.col("cents") > 0)
    )
    bands = (
        per_cust.groupBy(
            F.length(F.col("cents").cast("string")).alias("band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("band_cents"),
        )
    )
    return bands.select(
        F.col("band").cast("int").alias("band"),
        "n_customers",
        "band_cents",
        # decimal(38,0) intermediate: cum*1e6 overflows bigint past ~sf3
        F.expr(
            "cast(sum(band_cents) over (order by band desc "
            "rows between unbounded preceding and current row) "
            "as decimal(38,0)) * 1000000 div sum(band_cents) over ()"
        )
        .cast("bigint")
        .alias("cum_share_ppm"),
    )


_Q_CONCENTRATION_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(floor(SUM({_SQL_REV}) * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
  HAVING CAST(floor(SUM({_SQL_REV}) * 100) AS BIGINT) > 0
), bands AS (
  SELECT length(CAST(cents AS VARCHAR)) AS band,
         COUNT(*) AS n_customers,
         SUM(cents) AS band_cents
  FROM per_cust GROUP BY band
)
SELECT CAST(band AS INT) AS band,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(band_cents AS BIGINT) AS band_cents,
       CAST(CAST(SUM(band_cents) OVER (ORDER BY band DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS HUGEINT) * 1000000 // SUM(band_cents) OVER () AS BIGINT)
         AS cum_share_ppm
FROM bands
"""


# ---------------------------------------------------------------------------
# weekday × hour activity heatmap with z-scores
# ---------------------------------------------------------------------------


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event activity heatmap: counts per (day-of-week × hour-of-day)
    cell with each cell's z-score against the 168-cell grid (the
    ops-dashboard \"when is traffic unusual\" matrix). Both moments are
    computed from EXACT integer counts (Σc, Σc² as bigints), so mean/
    variance/z are single deterministic double expressions — no
    order-dependent float accumulation, the cross-engine hash is safe.
    One groupBy to ≤168 cells (partial-agg collapses executor-side);
    the moment pass is over those 168 rows via a broadcast scalar —
    the events scan happens once. dow/hod come from integer epoch
    arithmetic on the catalog's epoch-ns `ts` (1970-01-01 = Thursday →
    `(day+4)%7+1` is Spark's 1=Sunday convention), so no timezone or
    calendar function can diverge across engines."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("cast((ts div 86400000000000 + 4) % 7 + 1 as int)").alias(
            "dow"
        ),
        F.expr("cast((ts % 86400000000000) div 3600000000000 as int)").alias(
            "hod"
        ),
    )
    cells = ev.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = cells.agg(
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
        F.count(F.lit(1)).alias("k"),
    )
    mean = F.col("s1").cast("double") / F.col("k")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("k")
    ) / F.col("k")
    return cells.crossJoin(F.broadcast(stats)).select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hod").cast("int").alias("hod"),
        "n_events",
        ((F.col("n_events") - mean) / F.sqrt(var)).alias("zscore"),
    )


_Q_HEATMAP_SQL = """
WITH cells AS (
  SELECT CAST((epoch_ns(ts) // 86400000000000 + 4) % 7 + 1 AS INT) AS dow,
         CAST((epoch_ns(ts) % 86400000000000) // 3600000000000 AS INT)
           AS hod,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT SUM(n_events) AS s1,
         SUM(n_events * n_events) AS s2,
         COUNT(*) AS k
  FROM cells
)
SELECT CAST(dow AS INT) AS dow, CAST(hod AS INT) AS hod,
       CAST(n_events AS BIGINT) AS n_events,
       (n_events - CAST(s1 AS DOUBLE) / k)
         / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / k)
         AS zscore
FROM cells, stats
"""


QUERIES = {
    "q_forecast_seasonal_naive": q_forecast_seasonal_naive,
    "q_revenue_concentration": q_revenue_concentration,
    "q_activity_heatmap": q_activity_heatmap,
    "q_events_attribution": q_events_attribution,
    "q_rfm_segments": q_rfm_segments,
    "q_events_user_paths": q_events_user_paths,
    "q_grouping_sets": q_grouping_sets,
    "q_events_ohlc": q_events_ohlc,
    "q_events_variant": q_events_variant,
    "q_revenue_yoy": q_revenue_yoy,
    "q_gap_fill": q_gap_fill,
    "q_events_continuous_agg": q_events_continuous_agg,
    "q_events_disorder": q_events_disorder,
    "q_events_markov": q_events_markov,
    "q_cube_orders": q_cube_orders,
    "q_lapsed_customers": q_lapsed_customers,
    "q4_order_priority": q4_order_priority,
    "q12_late_line_priority": q12_late_line_priority,
    "q_events_json_kv": q_events_json_kv,
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q13_cust_order_distribution": q13_cust_order_distribution,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_parts_suppliers": q16_parts_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q_rollup_revenue": q_rollup_revenue,
    "q_balance_deciles": q_balance_deciles,
    "q_events_retention": q_events_retention,
    "q8_nation_market_share": q8_nation_market_share,
    "q_order_backlog": q_order_backlog,
    "q_supplier_lead_time": q_supplier_lead_time,
    "q_events_sliding_dau": q_events_sliding_dau,
    "q_order_aging": q_order_aging,
    "q_customer_migration": q_customer_migration,
    "q_order_cohort_ltv": q_order_cohort_ltv,
    "q_events_power_users": q_events_power_users,
    "q_basket_affinity": q_basket_affinity,
}

ORACLES = {
    "q_forecast_seasonal_naive": _Q_SEASONAL_SQL,
    "q_revenue_concentration": _Q_CONCENTRATION_SQL,
    "q_activity_heatmap": _Q_HEATMAP_SQL,
    "q_events_attribution": _Q_ATTRIBUTION_SQL,
    "q_rfm_segments": _Q_RFM_SQL,
    "q_events_user_paths": _Q_USER_PATHS_SQL,
    "q_events_ohlc": _Q_OHLC_SQL,
    "q_events_variant": _Q_VARIANT_SQL,
    "q_revenue_yoy": _Q_YOY_SQL,
    "q_gap_fill": _Q_GAP_FILL_SQL,
    "q_events_continuous_agg": _Q_CONT_AGG_SQL,
    "q_events_disorder": _Q_DISORDER_SQL,
    "q_events_markov": _Q_MARKOV_SQL,
    "q_cube_orders": _Q_CUBE_SQL,
    "q_grouping_sets": _Q_GROUPING_SETS_SQL,
    "q_lapsed_customers": _Q_LAPSED_SQL,
    "q4_order_priority": _Q4_SQL,
    "q12_late_line_priority": _Q12_SQL,
    "q_events_json_kv": _Q_JSON_KV_SQL,
    "q7_nation_volume": _Q7_SQL,
    "q9_product_profit": _Q9_SQL,
    "q13_cust_order_distribution": _Q13_SQL,
    "q17_small_qty_revenue": _Q17_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q16_parts_suppliers": _Q16_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "q_rollup_revenue": _Q_ROLLUP_SQL,
    "q_balance_deciles": _Q_DECILES_SQL,
    "q_events_retention": _Q_RETENTION_SQL,
    "q8_nation_market_share": _Q8_SQL,
    "q_order_backlog": _Q_BACKLOG_SQL,
    "q_supplier_lead_time": _Q_LEAD_TIME_SQL,
    "q_events_sliding_dau": _Q_SLIDING_DAU_SQL,
    "q_order_aging": _Q_AGING_SQL,
    "q_customer_migration": _Q_MIGRATION_SQL,
    "q_order_cohort_ltv": _Q_COHORT_LTV_SQL,
    "q_events_power_users": _q_power_users_sql(),
    "q_basket_affinity": _Q_BASKET_SQL,
}
