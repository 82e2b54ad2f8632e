"""Watermarked stream-stream interval join (SURVEY.md §2D).

The streaming counterpart of ``operators.scale.q_range_join``: purchases
matched to the same user's clicks in the preceding 30 minutes, with BOTH
sides unbounded. Watermarks bound the join state: Spark buffers each
side only until the other side's watermark passes the interval, so state
is O(events within the window horizon), not O(stream length) — the
property that lets this run forever on a 100 TB/day event feed.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.scratch import scratch_dir
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

JOIN_WINDOW = "30 minutes"
WATERMARK = "30 minutes"


def clicks_before_purchases(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Inner interval join: each (purchase, click) pair of the same user
    with click in [purchase - 30 min, purchase). Both inputs must carry
    (user_id, event_id, event_time)."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("c_time"),
        )
        .withWatermark("c_time", WATERMARK)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", WATERMARK)
    )
    return p.join(
        c,
        F.expr(
            f"""
            c_user = p_user AND
            c_time >= p_time - interval {JOIN_WINDOW} AND
            c_time < p_time
            """
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.unix_micros(F.col("p_time")).alias("purchase_ts_us"),
        F.unix_micros(F.col("c_time")).alias("click_ts_us"),
    )


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the interval join as a real two-stream query over the
    events table (split by type into two file-source streams), drained
    with availableNow into a memory sink. Bounded input ⇒ the result is
    exactly the batch interval join (deterministic rows-only check)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    work = scratch_dir("stream_ivjoin_")
    # one scan, one write: hive-partition by type, streams read subdirs
    events.filter(
        F.col("event_type").isin("click", "purchase")
    ).write.partitionBy("event_type").parquet(f"{work}/src")
    schema = events.drop("event_type").schema
    clicks = spark.readStream.schema(schema).parquet(
        f"{work}/src/event_type=click"
    )
    purchases = spark.readStream.schema(schema).parquet(
        f"{work}/src/event_type=purchase"
    )
    name = f"ivj_{uuid.uuid4().hex[:8]}"
    # stateful shuffle-partition count is fixed at first plan; size it to
    # the bounded catch-up batch (the per-partition state-store commit
    # overhead dominates at this volume), then restore the session conf
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            clicks_before_purchases(clicks, purchases)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


QUERIES = {"stream_interval_join": stream_interval_join}

# bounded two-stream drain ≡ the batch interval join over the same
# input — the exactly-once claim, made driver-checkable (30 min =
# 1_800_000_000 µs)
_INTERVAL_JOIN_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, (epoch_ns(ts) // 1000) AS t_us
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT p.user_id AS user_id, p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.t_us AS purchase_ts_us, c.t_us AS click_ts_us
FROM ev p JOIN ev c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.t_us >= p.t_us - 1800000000
 AND c.t_us < p.t_us
"""

ORACLES: dict[str, str] = {"stream_interval_join": _INTERVAL_JOIN_SQL}
