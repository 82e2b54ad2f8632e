"""§2B analytics suite vs DuckDB oracle at sf0.001 (exact match — the
driver's hash gate tolerates zero drift, so the local gate does too)."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.plans import (
    analytics,
    analytics_ext,
    timeseries,
)
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics.QUERIES))
def test_analytics_matches_oracle(spark, ddb, name):
    df = analytics.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, analytics.ORACLES[name])


@pytest.mark.parametrize("name", sorted(analytics_ext.QUERIES))
def test_analytics_ext_matches_oracle(spark, ddb, name):
    df = analytics_ext.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, analytics_ext.ORACLES[name])


def test_q_lapsed_customers(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.plans import analytics_ext

    assert_matches_oracle(
        analytics_ext.q_lapsed_customers(spark, SF_DIR),
        ddb,
        analytics_ext._Q_LAPSED_SQL,
    )


def test_disorder_audit_is_consistent(spark):
    from tests.conftest import SF_DIR

    for r in analytics_ext.q_events_disorder(spark, SF_DIR).collect():
        assert 0 <= r["n_late"] <= r["n_events"]
        assert r["max_lateness_us"] >= 0
        assert (r["max_lateness_us"] == 0) == (r["watermark_minutes"] == 0)


def test_asof_nearest_is_actually_nearest(spark):
    # brute-force per-user nearest click must agree with the window form
    from pyspark.sql import functions as F
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    rows = ev.collect()
    clicks = {}
    for r in rows:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(r["ts_us"])
    got = analytics.q_asof_nearest(spark, SF_DIR).collect()
    assert got
    for r in got:
        cs = clicks.get(r["user_id"], [])
        if not cs:
            assert r["nearest_click_ts_us"] is None
            continue
        best = min(abs(c - r["purchase_ts_us"]) for c in cs)
        assert r["abs_gap_us"] == best
        assert r["direction"] in ("before", "after")


def test_grouping_sets_skips_unrequested_rollup(spark):
    out = analytics_ext.q_grouping_sets(spark, SF_DIR).collect()
    gids = {r["gid"] for r in out}
    # grouping_id bits follow groupBy order (priority = high bit):
    # gid 0 = (priority,status), 2 = (status only), 3 = grand total;
    # gid 1 (priority only) must be absent — that's the pruned set
    assert gids == {0, 2, 3}
    total = [r for r in out if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n_orders"] == sum(
        r["n_orders"] for r in out if r["gid"] == 0
    )


@pytest.mark.parametrize("name", sorted(timeseries.QUERIES))
def test_timeseries_matches_oracle(spark, ddb, name):
    df = timeseries.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, timeseries.ORACLES[name])
