"""Scale-technique operators: skew salting and blocked range joins
(SURVEY.md §2B extensions).

Each query's RESULT is plain SQL (that's the oracle); what's special is
the physical strategy, chosen so the plan survives pathological data:

- ``q_salted_join`` / ``q_skew_two_phase`` — identical results to the
  direct join/aggregation, but hot keys spread over n_salt reducers.
- ``q_range_join`` — a bounded-interval join (purchases × clicks within
  the preceding 30 minutes) executed as an equi-join on time buckets
  plus a residual filter. Spark OSS would otherwise run a non-equi join
  as a broadcast-nested-loop — quadratic per user and a non-starter at
  100 TB; bucketing makes it a hash join whose cost is Σ bucket
  occupancy.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.functions.skew import (
    salted_join,
    two_phase_agg,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

N_SALT = 16
RANGE_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        "value",
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to a per-user signup-count dim via salted_join.
    Result ≡ the plain join (the oracle runs the plain join); the salt
    only changes shuffle distribution."""
    ev = _events(spark, sf_dir)
    dims = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_signups"))
    )
    joined = salted_join(
        ev.select("event_id", "user_id", "event_type"),
        dims,
        "user_id",
        n_salt=N_SALT,
    )
    return joined.select("event_id", "user_id", "event_type", "n_signups")


_SALTED_JOIN_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), dims AS (
  SELECT user_id, COUNT(*) AS n_signups FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT ev.event_id, ev.user_id, ev.event_type, dims.n_signups
FROM ev JOIN dims USING (user_id)
"""


def q_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via salted two-phase aggregation. Values
    pre-cast to decimal so the two-level sum is association-order-
    independent and matches the oracle's single-level SUM exactly."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    out = two_phase_agg(ev, ["event_type"], ["value"], n_salt=N_SALT)
    return out.select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


_SKEW_TWO_PHASE_SQL = """
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's click count in the preceding 30
    minutes — executed as a bucket equi-join: clicks replicate to their
    bucket and the next (a window can span at most one boundary), then
    the exact range predicate filters residuals. Left join keeps
    zero-click purchases."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        (F.col("ts_us") / RANGE_WINDOW_US).cast("bigint").alias("bucket"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts_us").alias("c_ts"),
            (F.col("ts_us") / RANGE_WINDOW_US).cast("bigint").alias("cb"),
        )
        .withColumn(
            "bucket", F.explode(F.array(F.col("cb"), F.col("cb") + 1))
        )
        .drop("cb")
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (purchases.bucket == clicks.bucket)
        & (clicks.c_ts >= purchases.ts_us - RANGE_WINDOW_US)
        & (clicks.c_ts < purchases.ts_us)
    )
    matched = purchases.join(clicks, cond, "left")
    return matched.groupBy("event_id", "user_id", "ts_us").agg(
        F.count(F.col("c_ts")).alias("n_recent_clicks")
    )


_RANGE_JOIN_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, (epoch_ns(ts) // 1000) AS ts_us
  FROM events
), purchases AS (
  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id AS c_user, ts_us AS c_ts FROM ev WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       COUNT(c.c_ts) AS n_recent_clicks
FROM purchases p LEFT JOIN clicks c
  ON c.c_user = p.user_id
 AND c.c_ts >= p.ts_us - {RANGE_WINDOW_US}
 AND c.c_ts < p.ts_us
GROUP BY p.event_id, p.user_id, p.ts_us
"""


BUCKETS = 8  # bucket count for the co-located join demo


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-bucketed co-located join: orders and lineitem persisted
    with `bucketBy({BUCKETS}, orderkey)` into the session catalog, then
    joined WITHOUT either side shuffling — the reader exposes the
    bucketing as the join's required distribution, so the exchange that
    dominates every large fact⋈fact join simply disappears from the
    plan (guarded in tests/test_plans.py: no Exchange keyed on
    orderkey). This is the storage-layout contract a 100 TB pipeline
    sets up ONCE at ingest and then amortizes over every downstream
    join and aggregation on the same key; salting (q_salted_join)
    handles the skew you didn't plan for, bucketing removes the
    shuffle you can plan for.

    The RESULT is deliberately plain (revenue + line count per order
    priority — same rows as joining the raw parquet), so the oracle is
    ordinary SQL; the bucketed tables are the physical strategy, not
    the semantics. Scratch tables are uniquely named per call and
    previous runs' tables are dropped first — the warehouse dir is
    session-scoped scratch, mirroring a real pipeline's managed-table
    namespace."""
    prefix = "graft_bkt_"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    tag = uuid.uuid4().hex[:8]
    t_orders, t_line = f"{prefix}o_{tag}", f"{prefix}l_{tag}"
    # explicit scratch paths (external tables): the default managed
    # location is <cwd>/spark-warehouse, and this operator must not
    # depend on the caller's working directory being writable
    from blog_snapshotbackup_azuredatalake_spark.scratch import scratch_dir

    work = scratch_dir("bucketed_join_")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.bucketBy(BUCKETS, "o_orderkey").sortBy("o_orderkey").option(
        "path", f"{work}/{t_orders}"
    ).mode("overwrite").saveAsTable(t_orders)
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).write.bucketBy(BUCKETS, "l_orderkey").sortBy("l_orderkey").option(
        "path", f"{work}/{t_line}"
    ).mode("overwrite").saveAsTable(t_line)
    o = spark.table(t_orders)
    li = spark.table(t_line)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    # merge hint: at demo SFs the dim side fits a broadcast, which would
    # sidestep the bucketed path entirely; at 100 TB both sides are
    # fact-sized and SMJ is what the planner picks anyway — the hint
    # pins the plan this operator exists to demonstrate (bucketed SMJ,
    # zero join-key exchanges)
    return (
        li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
    )


_BUCKETED_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "q_salted_join": q_salted_join,
    "q_skew_two_phase": q_skew_two_phase,
    "q_range_join": q_range_join,
    "q_bucketed_join": q_bucketed_join,
}

ORACLES = {
    "q_salted_join": _SALTED_JOIN_SQL,
    "q_skew_two_phase": _SKEW_TWO_PHASE_SQL,
    "q_range_join": _RANGE_JOIN_SQL,
    "q_bucketed_join": _BUCKETED_JOIN_SQL,
}
