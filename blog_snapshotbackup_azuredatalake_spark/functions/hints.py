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

BROADCAST_MAX_ROWS_CONF = "spark.graft.broadcastMaxRows"
DEFAULT_BROADCAST_MAX_ROWS = 4_000_000
# fast-path byte bound: multiple of the 10 MB default broadcast
# threshold — generous because the estimate is conservative (filters
# keep the child's full size without CBO stats)
FAST_PATH_BYTES = 64 << 20


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate — the same number the
    static planner compares against autoBroadcastJoinThreshold. Exact
    for raw file scans; a conservative overestimate above filters."""
    try:
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return min(int(str(est)), 1 << 62)
    except Exception:  # estimation must never break the query
        return 1 << 62


def broadcast_if_bounded(
    df: DataFrame, max_rows: int | None = None
) -> DataFrame:
    """``F.broadcast(df)`` only when ``df`` provably fits; otherwise
    the unhinted frame (AQE picks the strategy from actual sizes)."""
    if max_rows is None:
        max_rows = int(
            df.sparkSession.conf.get(
                BROADCAST_MAX_ROWS_CONF, str(DEFAULT_BROADCAST_MAX_ROWS)
            )
        )
    if _estimated_bytes(df) <= FAST_PATH_BYTES:
        return F.broadcast(df)
    n = df.limit(max_rows + 1).count()
    if n <= max_rows:
        return F.broadcast(df)
    return df
