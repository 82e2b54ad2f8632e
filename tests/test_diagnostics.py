"""Diagnostics plans vs DuckDB oracle at sf0.001."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.plans import diagnostics
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(diagnostics.ORACLES))
def test_diagnostics_matches_oracle(spark, ddb, name):
    df = diagnostics.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, diagnostics.ORACLES[name])


def test_anomaly_counts_are_sane(spark):
    rows = diagnostics.q_events_anomaly(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 3-sigma outliers must be rare and std non-negative
        assert 0 <= r["n_anomalies"] <= r["n_events"] * 0.05
        assert r["std_value"] >= 0


def test_plan_audit_all_green(spark):
    from blog_snapshotbackup_azuredatalake_spark.plans import diagnostics

    rows = diagnostics.diag_plan_audit(spark, SF_DIR).collect()
    assert len(rows) >= 7
    assert all(r["ok"] for r in rows), rows


def test_observe_metrics_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.plans import diagnostics

    df = diagnostics.diag_observe_metrics(spark, SF_DIR)
    assert_matches_oracle(df, ddb, diagnostics.ORACLES["diag_observe_metrics"])
