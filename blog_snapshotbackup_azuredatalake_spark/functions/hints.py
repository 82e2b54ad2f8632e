"""Guarded broadcast hints (SURVEY §6 broadcast-hint audit).

A forced ``F.broadcast`` is only safe for sets bounded BY CONSTRUCTION
(k×d centroid tables, sketch cells, top-K vocabularies). Several
operators broadcast sets bounded only by the DEMO's construction —
benchmark sets derived as corpus slices, dim-key sets, TPC-H dimension
tables — and at extreme scale those grow with the data (the sf30
dedup_ngram_jaccard OOM was exactly this class). This helper turns the
hint into a RUNTIME decision instead of prose:

1. **Driver-side fast path (no job)**: if Catalyst's optimized-plan
   size estimate is already under the session's
   ``autoBroadcastJoinThreshold``-scaled byte bound, hint. Raw dim
   tables hit this path — their LogicalRelation estimate is the actual
   file size — so at demo scale nothing changes and no probe job runs.
2. **Bounded probe**: otherwise count ``limit(max_rows + 1)`` — an
   early-terminating job whose cost is capped by the bound, not by the
   data — and hint only when the small side proves itself small.
3. **Fallback**: return the frame UNhinted. With AQE on (session
   default) the join degrades gracefully to shuffle-hash or a
   runtime-decided broadcast from ACTUAL sizes — it never OOMs the
   driver on a forced broadcast of an unbounded set.

The row bound is configurable per session via
``spark.graft.broadcastMaxRows`` (default 4M rows ≈ tens of MB of
keys); callers with a tighter contract pass ``max_rows`` explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BROADCAST_MAX_ROWS_CONF = "spark.graft.broadcastMaxRows"
DEFAULT_BROADCAST_MAX_ROWS = 4_000_000
BROADCAST_MAX_BYTES_CONF = "spark.graft.broadcastMaxBytes"
# probe-path byte bound: a forced broadcast materializes on the driver
# AND on every executor — 256 MB of payload is already generous for a
# "small side". Wide rows (text/array columns) under the row bound were
# previously force-broadcast unchecked, defeating the guard.
DEFAULT_BROADCAST_MAX_BYTES = 256 << 20
# fast-path byte bound: multiple of the 10 MB default broadcast
# threshold — generous because the estimate is conservative (filters
# keep the child's full size without CBO stats)
FAST_PATH_BYTES = 64 << 20


def _max_result_bytes(df: DataFrame) -> int:
    """spark.driver.maxResultSize as bytes (0 = unlimited), with a
    safety factor for serialization overhead."""
    try:
        raw = (
            df.sparkSession.sparkContext.getConf()
            .get("spark.driver.maxResultSize", "1g")
            .strip()
            .lower()
        )
        units = {"k": 10, "m": 20, "g": 30, "t": 40}
        if raw and raw[-1] in units:
            n = int(float(raw[:-1]) * (1 << units[raw[-1]]))
        else:
            n = int(raw)
        if n == 0:
            return 1 << 62
        return max(1, int(n * 0.8))
    except Exception:  # conf parsing must never break the query
        return DEFAULT_BROADCAST_MAX_BYTES


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate — the same number the
    static planner compares against autoBroadcastJoinThreshold. Exact
    for raw file scans; a conservative overestimate above filters."""
    try:
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return min(int(str(est)), 1 << 62)
    except Exception:  # estimation must never break the query
        return 1 << 62


def _row_bytes_expr(df: DataFrame):
    """Approximate serialized bytes of one row, as a single Column:
    actual octet length for string/binary, JSON length for nested
    types (close enough for a safety bound), 8 bytes per scalar."""
    fixed_width = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.BooleanType, T.DateType,
        T.TimestampType, T.TimestampNTZType,
    )
    parts = []
    for f in df.schema.fields:
        col = F.col(f"`{f.name}`")
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            parts.append(
                F.coalesce(F.octet_length(col), F.lit(0)).cast("bigint")
            )
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, fixed_width
        ):
            # element count × width: to_json on a 120M-element-total
            # numeric adjacency measurably dominated the probe job
            parts.append(
                (F.coalesce(F.size(col), F.lit(0)).cast("bigint") * 8 + 16)
            )
        elif isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ):
            parts.append(
                F.coalesce(F.octet_length(F.to_json(col)), F.lit(0)).cast(
                    "bigint"
                )
            )
        else:
            parts.append(F.lit(8).cast("bigint"))
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return total


def would_broadcast(
    df: DataFrame,
    max_rows: int | None = None,
    max_bytes: int | None = None,
) -> bool:
    """The broadcast_if_bounded decision WITHOUT the hint — for callers
    that apply one probe's verdict to several projections of the same
    relation (each separate probe is a full scan of it)."""
    return broadcast_if_bounded(df, max_rows, max_bytes) is not df


def broadcast_if_bounded(
    df: DataFrame,
    max_rows: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """``F.broadcast(df)`` only when ``df`` provably fits; otherwise
    the unhinted frame (AQE picks the strategy from actual sizes).
    The probe bounds BOTH row count and payload bytes — a relation
    under the row bound but carrying wide text/array columns is just
    as capable of OOMing the driver as a long one."""
    if max_rows is None:
        max_rows = int(
            df.sparkSession.conf.get(
                BROADCAST_MAX_ROWS_CONF, str(DEFAULT_BROADCAST_MAX_ROWS)
            )
        )
    if max_bytes is None:
        max_bytes = int(
            df.sparkSession.conf.get(
                BROADCAST_MAX_BYTES_CONF, str(DEFAULT_BROADCAST_MAX_BYTES)
            )
        )
    # a broadcast is BUILT by collecting to the driver, so whatever the
    # caller's budget, it can never exceed spark.driver.maxResultSize —
    # approving more kills the job at build time (measured: the 3 GB
    # triangle adjacency vs the 1 g default at 360 M edges)
    max_bytes = min(max_bytes, _max_result_bytes(df))
    # the fast path must still honor a caller budget SMALLER than its
    # own threshold — previously a max_bytes < 64 MB was ignored when
    # the estimate cleared FAST_PATH_BYTES, broadcasting past the
    # caller's explicit bound
    if _estimated_bytes(df) <= min(FAST_PATH_BYTES, max_bytes):
        return F.broadcast(df)
    # limit() takes a JVM int — clamp so byte-bounded callers can pass
    # "unbounded" row budgets without a Py4J signature error
    max_rows = min(max_rows, (1 << 31) - 2)
    # one probe job, cost capped by the row bound: count rows and sum
    # approximate row bytes over the bounded prefix together
    probe = (
        df.limit(max_rows + 1)
        .select(_row_bytes_expr(df).alias("__rb"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__rb"), F.lit(0)).alias("b"),
        )
        .collect()[0]
    )
    if probe["n"] <= max_rows and probe["b"] <= max_bytes:
        return F.broadcast(df)
    return df
