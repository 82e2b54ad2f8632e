"""§2B analytics suite vs DuckDB oracle at sf0.001 (exact match — the
driver's hash gate tolerates zero drift, so the local gate does too)."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.plans import analytics, analytics_ext
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
