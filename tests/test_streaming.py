"""Structured Streaming: exactly-once incremental sync, watermarked
windowed aggregation, stateful sessionization."""

import shutil

import pyspark.sql.functions as F
import pytest

from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from blog_snapshotbackup_azuredatalake_spark.streaming.incremental import (
    incremental_sync,
    run_windowed_stream,
    sync_daemon,
    windowed_event_counts,
)
from blog_snapshotbackup_azuredatalake_spark.streaming.sessions import sessionize_stream
from blog_snapshotbackup_azuredatalake_spark.streaming import entries, joins
from tests.conftest import SF_DIR, assert_matches_oracle


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

def _events_schema(spark):
    return load_table(spark, SF_DIR, "events").schema


def test_incremental_sync_exactly_once(spark, tmp_path):
    src = tmp_path / "landing"
    dst = str(tmp_path / "backup")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    events = load_table(spark, SF_DIR, "events")
    schema = events.schema

    first = events.filter(F.col("event_id") % 2 == 0)
    first.write.parquet(str(src / "batch0"))
    # file-source streams list files recursively only with a glob path
    incremental_sync(spark, f"{src}/*", dst, ckpt, schema)
    n1 = spark.read.parquet(dst).count()
    assert n1 == first.count()

    # re-run with no new files: nothing duplicated
    incremental_sync(spark, f"{src}/*", dst, ckpt, schema)
    assert spark.read.parquet(dst).count() == n1

    # second batch lands: only the delta appends
    second = events.filter(F.col("event_id") % 2 == 1)
    second.write.parquet(str(src / "batch1"))
    incremental_sync(spark, f"{src}/*", dst, ckpt, schema)
    assert spark.read.parquet(dst).count() == events.count()


def test_sync_daemon_follows_landing_dir(spark, tmp_path):
    src = tmp_path / "landing"
    dst = str(tmp_path / "backup")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    events = load_table(spark, SF_DIR, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    first.write.parquet(str(src / "batch0"))

    q = sync_daemon(spark, f"{src}/*", dst, ckpt, events.schema)
    try:
        q.processAllAvailable()
        assert spark.read.parquet(dst).count() == first.count()
        # daemon stays up; a new landing file syncs without a restart
        second = events.filter(F.col("event_id") % 2 == 1)
        second.write.parquet(str(src / "batch1"))
        q.processAllAvailable()
        assert spark.read.parquet(dst).count() == events.count()
    finally:
        q.stop()


def test_stream_dedup_drops_replayed_events(spark):
    from blog_snapshotbackup_azuredatalake_spark.streaming.entries import (
        stream_dedup,
    )

    events = load_table(spark, SF_DIR, "events")
    deduped = stream_dedup(spark, SF_DIR)
    assert deduped.count() == events.count()  # each event fed twice
    assert deduped.select("event_id").distinct().count() == events.count()


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    streamed = run_windowed_stream(
        spark, src, str(tmp_path / "ckpt"), events.schema, "wc_test"
    )
    batch = windowed_event_counts(events)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    shutil.rmtree(src)


def test_stateful_sessionization_stream(spark, tmp_path):
    from blog_snapshotbackup_azuredatalake_spark.streaming.sessions import SESSION_GAP_US

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    # NB: drain with processAllAvailable + stop, not an availableNow
    # trigger + awaitTermination (SURVEY.md §5): the extra watermark-
    # advance batch that closes timed-out sessions must get to run.
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.table("sessions_test").collect())

    # python oracle: gap-sessionize each user, then apply the emit rule —
    # non-final sessions always emit; a user's final session emits iff the
    # final watermark (max event time - gap) passed its timeout.
    rows = events.collect()
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["ts_us"])
    wm_ms = max(r["ts_us"] for r in rows) // 1000 - SESSION_GAP_US // 1000
    expected = []
    for uid, ts_list in by_user.items():
        ts_list.sort()
        start, last, n = ts_list[0], ts_list[0], 0
        sessions = []
        for t in ts_list:
            if t - last > SESSION_GAP_US:
                sessions.append((uid, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        sessions.append((uid, start, last, n))
        expected.extend(sessions[:-1])
        if (last + SESSION_GAP_US) // 1000 < wm_ms:
            expected.append(sessions[-1])
    assert got == sorted(expected)


def test_stream_cms_equals_batch_sketch(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators import sketch
    from blog_snapshotbackup_azuredatalake_spark.streaming import entries

    batch = {
        tuple(r) for r in sketch.sketch_cms_topk(spark, SF_DIR).collect()
    }
    streamed = {
        tuple(r)
        for r in entries.stream_cms_topk(spark, SF_DIR).collect()
    }
    assert streamed == batch


def test_stateful_streams_run_on_rocksdb_state_store(spark):
    """At 100 TB streaming state exceeds executor heap; RocksDB is the
    store you'd deploy. Certify both stateful shapes (python state via
    applyInPandasWithState, native state via
    dropDuplicatesWithinWatermark) produce identical results under it."""
    from blog_snapshotbackup_azuredatalake_spark.streaming import entries

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        sess = entries.stream_sessionize(spark, SF_DIR)
        assert sess.count() > 0
        deduped = entries.stream_dedup(spark, SF_DIR)
        n_events = deduped.select("event_id").distinct().count()
        assert deduped.count() == n_events
    finally:
        spark.conf.set(key, default)


def test_stream_enrich_static_broadcasts_no_state(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )
    from blog_snapshotbackup_azuredatalake_spark.streaming import entries

    enriched = entries.stream_enrich_static(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    rows = enriched.collect()
    assert len(rows) == n_events  # inner join loses nothing: dim covers all
    assert all(r["age_us"] >= 0 for r in rows)
    assert any(r["age_us"] == 0 for r in rows)  # each user's first event


def test_stream_hll_equals_batch_sketch(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.sketch import (
        sketch_hll_grouped,
    )
    from blog_snapshotbackup_azuredatalake_spark.streaming.entries import (
        stream_hll_distinct,
    )
    from tests.conftest import SF_DIR

    srows = sorted(stream_hll_distinct(spark, SF_DIR).collect())
    brows = sorted(sketch_hll_grouped(spark, SF_DIR).collect())
    assert srows == brows  # mergeable registers: stream ≡ batch


def test_stream_ivm_equals_batch_ivm(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.snapshot import snap_ivm
    from blog_snapshotbackup_azuredatalake_spark.streaming.entries import stream_ivm
    from tests.conftest import SF_DIR

    got = sorted(tuple(r) for r in stream_ivm(spark, SF_DIR).collect())
    want = sorted(tuple(r) for r in snap_ivm(spark, SF_DIR).collect())
    assert got == want  # the streaming state drains to the exact batch view
    assert all(r[-1] for r in got)  # is_consistent everywhere


def test_stateful_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery of AGGREGATION STATE (not just source
    offsets): drain half the input, stop the query, land the rest,
    restart on the same checkpoint — the recovered state must continue
    accumulating, and the final drained sketch must equal the batch
    sketch over everything."""
    import uuid

    from pyspark.sql import functions as F  # noqa: F811
    from blog_snapshotbackup_azuredatalake_spark.operators.sketch import cms_cells
    from blog_snapshotbackup_azuredatalake_spark.streaming.entries import (
        demo_state_partitions,
    )

    events = load_table(spark, SF_DIR, "events").select(
        F.col("user_id").cast("string").alias("v")
    )
    src = tmp_path / "cms_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    events.filter(F.crc32(F.col("v")) % 2 == 0).coalesce(2).write.parquet(
        str(src / "b0")
    )

    def drain() -> str:
        name = f"cmsr_{uuid.uuid4().hex[:8]}"
        stream = spark.readStream.schema("v string").parquet(f"{src}/*")
        with demo_state_partitions(spark):
            q = (
                cms_cells(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return name

    drain()  # first run consumes b0, checkpoints its state, stops
    events.filter(F.crc32(F.col("v")) % 2 == 1).coalesce(2).write.parquet(
        str(src / "b1")
    )
    name = drain()  # restart: recovered state + b1 only

    got = {
        (r["j"], r["bucket"]): r["cnt"] for r in spark.table(name).collect()
    }
    want = {
        (r["j"], r["bucket"]): r["cnt"] for r in cms_cells(events).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "name", sorted({**entries.ORACLES, **joins.ORACLES})
)
def test_stream_entries_match_oracle(spark, ddb, name):
    """Every SQL-oracled stream entry: the bounded drain must equal the
    batch answer cell-for-cell (mirrors the driver gate)."""
    allq = {**entries.QUERIES, **joins.QUERIES}
    allo = {**entries.ORACLES, **joins.ORACLES}
    assert_matches_oracle(allq[name](spark, SF_DIR), ddb, allo[name])


def test_stream_apply_cdc_certificate(spark):
    rows = {r["check"]: r["ok"] for r in
            entries.stream_apply_cdc(spark, SF_DIR).collect()}
    assert rows and all(rows.values()), rows


def test_stream_topk_per_window_matches_oracle(spark, ddb):
    df = entries.stream_topk_per_window(spark, SF_DIR)
    assert_matches_oracle(df, ddb, entries.ORACLES["stream_topk_per_window"])


def test_stream_topk_per_window_rank_contract(spark):
    rows = entries.stream_topk_per_window(spark, SF_DIR).collect()
    assert rows
    per_win = {}
    for r in rows:
        per_win.setdefault(r["window_start_us"], []).append(r)
    for win, rs in per_win.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= entries.STREAM_TOPK_K
        # counts are non-increasing with rank
        by_rank = sorted(rs, key=lambda r: r["rank"])
        counts = [r["n_events"] for r in by_rank]
        assert counts == sorted(counts, reverse=True)
