"""Structured-Streaming incremental sync (SURVEY.md §2A/§2D).

The reference's "incremental backup" loop — watch a landing area, append
only new files to the backup — is exactly Spark's file-source streaming
contract: the checkpoint tracks which source files were committed, giving
exactly-once appends across restarts and partial failures with no custom
bookkeeping. ``Trigger.AvailableNow`` makes each run a catch-up batch job
(the cron-style backup run), while the same code with a processing-time
trigger is a continuous sync daemon.

At scale the sink partitions by a date column so downstream verify /
restore can prune partitions (see snap_partition_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def incremental_sync(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    partition_by: str | None = None,
) -> None:
    """Run one exactly-once catch-up sync of new parquet files from
    `source_dir` into `target_dir`."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    q = writer.start()
    q.awaitTermination()


def sync_daemon(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    interval: str = "1 second",
    partition_by: str | None = None,
):
    """Continuous-sync daemon: the same exactly-once file sync as
    ``incremental_sync`` but left running on a processing-time trigger,
    appending each new landing file within `interval` of its arrival.
    Returns the live StreamingQuery — callers own its lifecycle
    (``processAllAvailable()`` to barrier in tests, ``stop()`` to end).
    Same checkpoint contract, so a crashed daemon resumes exactly-once
    and can be downgraded to cron-style ``incremental_sync`` runs and
    back without re-copying."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    return writer.start()


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id with BOUNDED state: duplicates
    are only possible within the replay window (an at-least-once
    upstream re-sends recent events, not year-old ones), so
    ``dropDuplicatesWithinWatermark`` lets Spark evict ids older than
    the 30-minute watermark instead of keeping every key ever seen —
    the difference between O(window) and O(corpus) state at 100 TB."""
    with_ts = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("ts div 1000").alias("ts_us"),
        )
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 10-minute event counts with a 30-minute watermark for
    late data — the streaming rollup a backup-audit dashboard reads.
    Works on both a stream (stateful, late rows folded in until the
    watermark passes) and a static frame (plain window agg)."""
    with_ts = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "10 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    query_name: str = "windowed_counts",
) -> DataFrame:
    """Drive `windowed_event_counts` as a real stream from a parquet
    directory into an in-memory sink (complete mode); returns the sink
    table after the availableNow batch drains."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
