"""Transactional commit log: atomic versioning, optimistic conflicts,
metadata time travel, and the SnapshotManager integration."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.operators import snapshot_manager
from blog_snapshotbackup_azuredatalake_spark.operators.snapshot_manager import (
    SnapshotManager,
)
from blog_snapshotbackup_azuredatalake_spark.operators.txnlog import (
    CommitConflict,
    TransactionLog,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

def test_commit_versions_are_sequential(tmp_path):
    log = TransactionLog(str(tmp_path))
    assert log.latest_version() is None
    v0 = log.commit("a", [{"add": {"path": "x"}}])
    v1 = log.commit("b", [{"add": {"path": "y"}}])
    assert (v0, v1) == (0, 1)
    assert log.versions() == [0, 1]


def test_optimistic_conflict_detected(tmp_path):
    log = TransactionLog(str(tmp_path))
    log.commit("a", [{"add": {"path": "x"}}])
    stale = log.latest_version()
    log.commit("b", [{"add": {"path": "y"}}])  # someone else commits
    with pytest.raises(CommitConflict):
        log.commit("c", [{"add": {"path": "z"}}], read_version=stale)
    # blind append still succeeds after the conflict
    assert log.commit("c", [{"add": {"path": "z"}}]) == 2


def test_state_time_travel(tmp_path):
    log = TransactionLog(str(tmp_path))
    log.commit("a", [{"add": {"path": "x"}}])
    log.commit("b", [{"add": {"path": "y"}}])
    log.commit("c", [{"remove": {"path": "x"}}])
    assert set(log.state(as_of=0)) == {"x"}
    assert set(log.state(as_of=1)) == {"x", "y"}
    assert set(log.state()) == {"y"}
    hist = log.history()
    assert [h["op"] for h in hist] == ["a", "b", "c"]
    assert hist[2]["n_remove"] == 1


def test_manager_logs_lifecycle(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").limit(200)
    mgr = SnapshotManager(spark, str(tmp_path / "b"))
    mgr.snapshot(orders, "orders", "o_orderkey")
    mgr.snapshot(orders, "orders", "o_orderkey")
    assert [h["op"] for h in mgr.log.history()] == ["snapshot", "snapshot"]
    assert set(mgr.log.state()) == {
        "orders/snap_000000",
        "orders/snap_000001",
    }
    # restore keyed by log version equals restore keyed by snapshot id
    v0 = mgr.restore_at_log_version("orders", 0)
    assert v0.count() == 200


def test_manager_force_full_and_purge_logged(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").limit(100)
    mgr = SnapshotManager(spark, str(tmp_path / "b"))
    mgr.snapshot(orders, "orders", "o_orderkey")
    mgr.snapshot(orders, "orders", "o_orderkey")
    mgr.snapshot(orders, "orders", "o_orderkey", force_full=True)
    purged = mgr.purge("orders", keep_last=1)
    assert purged == [0, 1]
    hist = mgr.log.history()
    assert [h["op"] for h in hist] == [
        "snapshot", "snapshot", "snapshot", "purge",
    ]
    assert set(mgr.log.state()) == {"orders/snap_000002"}
    assert mgr.restore("orders", 2).count() == 100


def test_snap_txn_log_entry(spark):
    df = snapshot_manager.snap_txn_log(spark, SF_DIR)
    rows = df.collect()
    # 3 snapshot adds + 2 purge removes, only the forced-full stays live
    assert len(rows) == 5
    live = {r["path"] for r in rows if r["live"]}
    assert live == {"orders/snap_000002"}


def test_manager_compact_is_logged_and_lossless(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").limit(300).repartition(16)
    mgr = SnapshotManager(spark, str(tmp_path / "b"))
    mgr.snapshot(orders, "orders", "o_orderkey")
    stats = mgr.compact("orders", 0, target_rows_per_file=1000)
    assert stats["files_after"] < stats["files_before"]
    assert mgr.restore("orders", 0).count() == 300
    hist = mgr.log.history()
    assert [h["op"] for h in hist] == ["snapshot", "compact"]
    # compact must not change which snapshots are live
    assert set(mgr.log.state()) == {"orders/snap_000000"}


def test_txn_conflict_entry_matches_contract(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.operators import (
        snapshot_manager as sm,
    )
    from tests.conftest import SF_DIR, assert_matches_oracle

    df = sm.snap_txn_conflict(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sm.ORACLES["snap_txn_conflict"])
