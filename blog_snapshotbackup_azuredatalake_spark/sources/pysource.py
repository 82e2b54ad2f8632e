"""Python Data Source API (Spark 4) — a custom partitioned source.

The lakehouse needs sources beyond files: feeds, synthetic generators,
internal services. Spark 4's Python Data Source API
(``pyspark.sql.datasource``) lets those live in the same plan as
parquet scans — partitioned, parallel, Arrow-batched — without a JVM
connector. This module ships a deterministic synthetic-events source
(the row content is a pure function of the row id, so a SQL oracle can
recompute every aggregate) and the driver-facing entry that proves the
source: read through the registered format, aggregate per bucket, and
let the DuckDB oracle derive the same numbers from ``range()``.

Scale shape: ``partitions()`` splits the id space into fixed-size
slices, so the read parallelizes like any file scan and each Python
worker generates only its slice — no driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

PYSRC_ROWS_PER_PARTITION = 25_000
PYSRC_VAL_MOD = 97
PYSRC_BUCKETS = 10


class _IdSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("total_rows", n)``:
    rows (id, bucket, val) with bucket = id % {PYSRC_BUCKETS} and
    val = id² % {PYSRC_VAL_MOD} — deterministic, so oracle-checkable."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket int, val bigint"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(int(self.options.get("total_rows", 0)))


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, total_rows: int):
        self.total_rows = total_rows

    def partitions(self):
        step = PYSRC_ROWS_PER_PARTITION
        return [
            _IdSlice(lo, min(lo + step, self.total_rows))
            for lo in range(0, self.total_rows, step)
        ] or [_IdSlice(0, 0)]

    def read(self, partition: _IdSlice):
        for i in range(partition.start, partition.end):
            yield (i, i % PYSRC_BUCKETS, (i * i) % PYSRC_VAL_MOD)


def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the Python data source and prove it end-to-end: the
    source generates exactly |events| rows (sf-proportional), the plan
    aggregates per bucket, and the oracle recomputes count/Σval/
    distinct-val per bucket from the same id rules over ``range()``.
    A partition-count column pins that the read actually parallelized
    (one slice per {PYSRC_ROWS_PER_PARTITION} ids), not a
    single-partition fallback."""
    from blog_snapshotbackup_azuredatalake_spark.session import (
        ensure_package_on_workers,
    )
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    ensure_package_on_workers(spark)  # reader class unpickles on workers
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception as exc:  # noqa: BLE001 — filtered re-raise below
        # Only the duplicate-registration case is benign; swallowing a
        # genuine registration failure would resurface later as a
        # baffling "format synthetic_events not found" at read time.
        msg = str(exc).lower()
        if "already" not in msg and "exists" not in msg:
            raise
    total = load_table(spark, sf_dir, "events").count()
    df = (
        spark.read.format("synthetic_events")
        .option("total_rows", str(total))
        .load()
    )
    n_parts = df.rdd.getNumPartitions()
    expected_parts = max(
        1,
        (total + PYSRC_ROWS_PER_PARTITION - 1) // PYSRC_ROWS_PER_PARTITION,
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").alias("val_sum"),
        F.count_distinct("val").alias("val_distinct"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    ).withColumn(
        "parallel_read", F.lit(bool(n_parts == expected_parts))
    )


_PYSOURCE_SQL = f"""
WITH ids AS (
  SELECT unnest(range(0, (SELECT COUNT(*) FROM events))) AS id
),
rows_ AS (
  SELECT id, CAST(id % {PYSRC_BUCKETS} AS INT) AS bucket,
         CAST((id * id) % {PYSRC_VAL_MOD} AS BIGINT) AS val
  FROM ids
)
SELECT bucket, COUNT(*) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS val_sum,
       COUNT(DISTINCT val) AS val_distinct,
       MIN(id) AS min_id, MAX(id) AS max_id,
       TRUE AS parallel_read
FROM rows_ GROUP BY bucket
"""

PYSRC_STREAM_BATCHES = 3  # id space drained in this many micro-batches


def _make_stream_source():
    """Build the streaming DataSource CLASS inside a function scope:
    the simple-stream-reader unpickles in Spark's Python streaming
    source runner, a separate process that does NOT see addPyFile
    paths — a module-level class pickles by reference and dies there
    with ModuleNotFoundError (measured), while a locally-defined class
    makes cloudpickle serialize it by value. Streaming twin of the
    synthetic source (Spark 4 Python Data Source streaming API): an
    offset cursor over the id space — the feed-connector shape
    (Kafka-less queue, internal service poll) in pure Python. Offsets
    are ``{"pos": n}``; ``read`` advances at most batch_rows per
    micro-batch and ``readBetweenOffsets`` regenerates any committed
    range deterministically, which is what makes the drained result
    oracle-checkable."""
    buckets, val_mod = PYSRC_BUCKETS, PYSRC_VAL_MOD

    def rows_for(start: int, end: int):
        # a LIST iterator, not a generator: the runner's prefetch cache
        # copy.copy()s the returned iterator and generators can't be
        # pickled (simple readers run driver-side and hold the batch in
        # memory by design — size batch_rows accordingly)
        return iter(
            [(i, i % buckets, (i * i) % val_mod) for i in range(start, end)]
        )

    class SyntheticStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, total_rows: int, batch_rows: int):
            self.total_rows = total_rows
            self.batch_rows = max(1, batch_rows)

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = int(start["pos"])
            end = min(pos + self.batch_rows, self.total_rows)
            return rows_for(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return rows_for(int(start["pos"]), int(end["pos"]))

        def commit(self, end):  # offsets below `end` are replay-safe
            pass

    class SyntheticEventsStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_events_stream"

        def schema(self) -> str:
            return "id bigint, bucket int, val bigint"

        def simpleStreamReader(self, schema):
            return SyntheticStreamReader(
                int(self.options.get("total_rows", 0)),
                int(self.options.get("batch_rows", 1)),
            )

    return SyntheticEventsStreamSource


def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the Python STREAMING source end-to-end: |events| rows
    arrive through an offset cursor in {PYSRC_STREAM_BATCHES}
    micro-batches, a streaming aggregation folds them per bucket in
    complete mode, and the drained state must equal the batch answer
    recomputed by the oracle from the same id rules. availableNow on a
    simple stream reader consumes ONE prefetched read() per run
    (measured), so the drain loops bounded availableNow cycles over a
    SINGLE checkpoint — each cycle is a real micro-batch with offset
    commit + replay contract, which is the point of the entry. The
    emitted n_microbatches pins that the cursor advanced batch-wise,
    not in one gulp."""
    import uuid

    from blog_snapshotbackup_azuredatalake_spark.scratch import scratch_dir
    from blog_snapshotbackup_azuredatalake_spark.session import (
        ensure_package_on_workers,
    )
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    ensure_package_on_workers(spark)
    try:
        spark.dataSource.register(_make_stream_source())
    except Exception as exc:  # noqa: BLE001 — filtered re-raise
        msg = str(exc).lower()
        if "already" not in msg and "exists" not in msg:
            raise
    total = load_table(spark, sf_dir, "events").count()
    batch_rows = (total + PYSRC_STREAM_BATCHES - 1) // PYSRC_STREAM_BATCHES
    work = scratch_dir("pystream_")
    name = f"pystream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthetic_events_stream")
        .option("total_rows", str(total))
        .option("batch_rows", str(batch_rows))
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").alias("val_sum"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )
    n_cycles = 0
    # headroom of +1 cycle, but the loop breaks as soon as the memory
    # sink holds every row — the drained-in-exactly-N-batches invariant
    # is pinned by the n_microbatches == PYSRC_STREAM_BATCHES oracle
    # check, not by running an extra no-op cycle
    for _ in range(PYSRC_STREAM_BATCHES + 1):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_cycles += 1
        drained = spark.table(name).agg(
            F.coalesce(F.sum("n_rows"), F.lit(0))
        ).collect()[0][0]
        if drained >= total:
            break
    return spark.table(name).withColumn(
        "n_microbatches", F.lit(int(n_cycles)).cast("int")
    )


_PYSTREAM_SQL = f"""
WITH ids AS (
  SELECT unnest(range(0, (SELECT COUNT(*) FROM events))) AS id
),
rows_ AS (
  SELECT id, CAST(id % {PYSRC_BUCKETS} AS INT) AS bucket,
         CAST((id * id) % {PYSRC_VAL_MOD} AS BIGINT) AS val
  FROM ids
)
SELECT bucket, COUNT(*) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS val_sum,
       MIN(id) AS min_id, MAX(id) AS max_id,
       CAST({PYSRC_STREAM_BATCHES} AS INT) AS n_microbatches
FROM rows_ GROUP BY bucket
"""

UDTF_SEG_TOKENS = 32


def source_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF surface (the last UDF API this repo did not
    exercise: scalar/pandas UDF, mapInPandas, applyInPandas(+state),
    Arrow kernel, Python data source batch+stream, and now a
    table-valued function in a LATERAL join). The UDTF explodes each
    document into NON-overlapping {UDTF_SEG_TOKENS}-token segments
    (doc_chunk's overlapping chunker stays the engine-side production
    path) and the entry reports per-source segment-dup stats — the C4
    paragraph-dedup precursor measurement.

    Scale note: a row-at-a-time Python UDTF is the SLOW path by
    construction; this entry is the API-surface certificate, sized by
    the corpus once. The identical result is available engine-side via
    the doc_chunk machinery — the point is that the plumbing (lateral
    table function, schema contract, registration) is real and
    oracle-checked."""
    import hashlib as _hl

    from pyspark.sql.functions import udtf

    @udtf(returnType="source string, seg_hash string")
    class DocSegments:
        def eval(self, source, text):  # noqa: ANN001
            toks = text.split(" ")
            for i in range(0, len(toks), UDTF_SEG_TOKENS):
                seg = " ".join(toks[i : i + UDTF_SEG_TOKENS])
                yield source, _hl.md5(seg.encode("utf-8")).hexdigest()

    spark.udtf.register("doc_segments_udtf", DocSegments)
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    seg = spark.sql(
        "SELECT s.source, s.seg_hash FROM __udtf_docs d,"
        " LATERAL doc_segments_udtf(d.source, d.text) s"
    )
    agg = seg.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count_distinct("seg_hash").alias("distinct_segments"),
    )
    return agg.select(
        "source",
        F.col("n_segments").cast("bigint").alias("n_segments"),
        F.col("distinct_segments").cast("bigint").alias(
            "distinct_segments"
        ),
        F.expr(
            "(n_segments - distinct_segments) * 1000000"
            " div greatest(n_segments, 1)"
        ).cast("bigint").alias("dup_seg_ppm"),
    )


_PYUDTF_SQL = f"""
WITH seg AS (
  SELECT source,
         md5(array_to_string(
           toks[(i - 1) * {UDTF_SEG_TOKENS} + 1
                : (i - 1) * {UDTF_SEG_TOKENS} + {UDTF_SEG_TOKENS}],
           ' ')) AS seg_hash
  FROM (SELECT source, string_split(text, ' ') AS toks FROM documents),
       UNNEST(range(1, CAST(ceil(len(toks)
             / {UDTF_SEG_TOKENS}.0) AS BIGINT) + 1)) AS t(i)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(DISTINCT seg_hash) AS BIGINT) AS distinct_segments,
       CAST((COUNT(*) - COUNT(DISTINCT seg_hash)) * 1000000
            // GREATEST(COUNT(*), 1) AS BIGINT) AS dup_seg_ppm
FROM seg GROUP BY source
"""

QUERIES = {
    "source_python_datasource": source_python_datasource,
    "source_python_stream": source_python_stream,
    "source_python_udtf": source_python_udtf,
}
ORACLES = {
    "source_python_datasource": _PYSOURCE_SQL,
    "source_python_stream": _PYSTREAM_SQL,
    "source_python_udtf": _PYUDTF_SQL,
}
