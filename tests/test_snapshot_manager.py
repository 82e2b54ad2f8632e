"""SnapshotManager lifecycle: full snapshot → mutate → incremental →
restore both states → verify → retention purge."""

import pyspark.sql.functions as F
import pytest

from blog_snapshotbackup_azuredatalake_spark.operators.snapshot_manager import SnapshotManager
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def mgr(spark, tmp_path):
    return SnapshotManager(spark, str(tmp_path / "backups"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lifecycle(spark, mgr):
    orders = load_table(spark, SF_DIR, "orders")
    s0 = mgr.snapshot(orders, "orders", "o_orderkey")
    assert s0 == 0

    # mutate: change some prices, delete some rows, add new rows
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % 13 != 0)
    added = orders.filter(F.col("o_orderkey") % 17 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    v2 = changed.unionByName(added)

    s1 = mgr.snapshot(v2, "orders", "o_orderkey")
    assert s1 == 1

    # delta stored, not a full copy
    delta = spark.read.parquet(f"{mgr._dir('orders', 1)}/data")
    assert 0 < delta.count() < orders.count()

    # restores reproduce both states exactly
    assert _sorted_rows(mgr.restore("orders", 0)) == _sorted_rows(orders)
    assert _sorted_rows(mgr.restore("orders", 1)) == _sorted_rows(v2)

    # verify: v2 matches snap 1, diverges from snap 0
    assert mgr.verify(v2, "orders", 1)["ok"]
    rep = mgr.verify(v2, "orders", 0)
    assert not rep["ok"] and rep["changed"] > 0 and rep["extra_live"] > 0


def test_purge_keeps_dependency_chain(spark, mgr):
    orders = load_table(spark, SF_DIR, "orders").limit(100)
    mgr.snapshot(orders, "t", "o_orderkey")
    for i in range(3):
        v = orders.withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(float(i + 1))
        )
        mgr.snapshot(v, "t", "o_orderkey")
    purged = mgr.purge("t", keep_last=1)
    # snap 3 depends on base snap 0: both survive; 1 and 2 go
    assert purged == [1, 2]
    assert mgr.snapshot_ids("t") == [0, 3]
    assert mgr.restore("t", 3).count() == 100
