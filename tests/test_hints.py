"""Guarded broadcast hints (functions/hints.py): the §6 broadcast-hint
audit as enforced code. The three demo-bounded hint classes (bench
sets, dim-key sets, TPC-H dims) must broadcast at demo scale and
degrade to an AQE-planned join past the bound — never force an
unbounded broadcast (the sf30 dedup_ngram_jaccard OOM class)."""
import pytest
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.functions.hints import (
    BROADCAST_MAX_ROWS_CONF,
    broadcast_if_bounded,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable the planner's own size-based broadcast so any broadcast
    in the plan can only come from OUR hint."""
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_dim_takes_fast_path_and_broadcasts(spark, no_auto_broadcast):
    """Raw dim under the byte bound: hinted with NO probe job (the
    Catalyst file-size estimate decides driver-side)."""
    dim = load_table(spark, SF_DIR, "nation")
    dim.schema  # force file listing/schema jobs before the baseline
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    hinted = broadcast_if_bounded(dim)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "fast path must not launch a job"
    fact = load_table(spark, SF_DIR, "customer")
    j = fact.join(hinted, fact.c_nationkey == dim.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_probe_confirms_small_derived_set(spark, no_auto_broadcast):
    """Estimate over the byte bound but actual rows under the row
    bound: the bounded probe runs and the hint stays."""
    # range estimate = 8 bytes/row -> 160 MB, over the 64 MB fast path
    few = spark.range(20_000_000).filter(F.col("id") % 1_000_000 == 0)
    j = spark.range(1000).join(
        broadcast_if_bounded(few, max_rows=10_000), "id"
    )
    assert "BroadcastHashJoin" in _plan(j)


def test_past_bound_falls_back_unhinted(spark, no_auto_broadcast):
    """Past the row bound the hint is dropped: with the planner's auto
    broadcast off, the join must NOT contain a forced broadcast."""
    big = spark.range(20_000_000)
    j = spark.range(1000).join(
        broadcast_if_bounded(big, max_rows=10_000), "id"
    )
    p = _plan(j)
    assert "BroadcastHashJoin" not in p and "BroadcastExchange" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p


def test_wide_rows_under_row_bound_fall_back(spark, no_auto_broadcast):
    """A relation UNDER the row bound but with wide payloads (the
    text/array-column class) must not be force-broadcast: the probe
    bounds bytes too, not just rows."""
    wide = (
        spark.range(20_000_000)  # 160 MB estimate -> past the fast path
        .filter(F.col("id") % 100 == 0)  # 200k rows, under the row bound
        .withColumn("pad", F.repeat(F.lit("x"), 10_000))  # ~2 GB payload
    )
    j = spark.range(1000).join(
        broadcast_if_bounded(wide, max_rows=1_000_000), "id"
    )
    p = _plan(j)
    assert "BroadcastHashJoin" not in p and "BroadcastExchange" not in p


def test_conf_overrides_row_bound(spark, no_auto_broadcast):
    old = spark.conf.get(BROADCAST_MAX_ROWS_CONF, None)
    spark.conf.set(BROADCAST_MAX_ROWS_CONF, "100")
    try:
        over = spark.range(20_000_000).filter(F.col("id") % 10_000 == 0)
        j = spark.range(1000).join(broadcast_if_bounded(over), "id")
        assert "BroadcastHashJoin" not in _plan(j)
    finally:
        if old is None:
            spark.conf.unset(BROADCAST_MAX_ROWS_CONF)
        else:
            spark.conf.set(BROADCAST_MAX_ROWS_CONF, old)


def test_guarded_sites_still_broadcast_at_demo_scale(spark):
    """The swapped operator sites keep their broadcast plans at test
    scale (dims/bench sets are genuinely small here)."""
    from blog_snapshotbackup_azuredatalake_spark.operators.quality import (
        dq_referential,
    )
    from blog_snapshotbackup_azuredatalake_spark.plans.analytics import (
        q5_local_supplier,
    )

    assert "BroadcastHashJoin" in _plan(q5_local_supplier(spark, SF_DIR))
    assert "Broadcast" in _plan(dq_referential(spark, SF_DIR))
