"""Portable-HLL sketch vs DuckDB oracle at sf0.001, plus accuracy."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.operators import sketch
from tests.conftest import SF_DIR, assert_matches_oracle


def test_hll_matches_oracle(spark, ddb):
    df = sketch.sketch_hll_distinct(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sketch.ORACLES["sketch_hll_distinct"])


def test_cms_matches_oracle(spark, ddb):
    df = sketch.sketch_cms_topk(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sketch.ORACLES["sketch_cms_topk"])


def test_cms_never_undercounts(spark):
    rows = sketch.sketch_cms_topk(spark, SF_DIR).collect()
    assert len(rows) == sketch.CMS_TOPK
    for r in rows:
        assert r["n_cms"] >= r["n_exact"], (r["user_id"], r["n_exact"], r["n_cms"])


def test_hist_quantile_matches_oracle(spark, ddb):
    df = sketch.sketch_hist_quantile(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sketch.ORACLES["sketch_hist_quantile"])


def test_hist_quantile_within_one_bucket(spark, ddb):
    rows = sketch.sketch_hist_quantile(spark, SF_DIR).collect()
    assert {r["q"] for r in rows} == set(sketch.QUANTILES)
    vmin, vmax = ddb.execute(
        "SELECT MIN(value), MAX(value) FROM events"
    ).fetchone()
    width = (vmax - vmin) / sketch.HIST_BUCKETS
    for r in rows:
        assert abs(r["est_value"] - r["exact_value"]) <= width + 1e-9, (
            r["q"], r["exact_value"], r["est_value"], width,
        )


def test_hll_estimate_accuracy(spark):
    rows = sketch.sketch_hll_distinct(spark, SF_DIR).collect()
    assert len(rows) == len(sketch._TARGETS)
    for r in rows:
        rel_err = abs(r["n_hll"] - r["n_exact"]) / r["n_exact"]
        # 1.04/sqrt(256) ≈ 6.5% std error; allow 3 sigma
        assert rel_err < 0.20, (r["col_name"], r["n_exact"], r["n_hll"])


def test_hll_grouped_matches_oracle(spark, ddb):
    df = sketch.sketch_hll_grouped(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sketch.ORACLES["sketch_hll_grouped"])


def test_hll_grouped_accuracy_and_coverage(spark, ddb):
    rows = sketch.sketch_hll_grouped(spark, SF_DIR).collect()
    n_types = ddb.execute(
        "SELECT COUNT(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    assert len(rows) == n_types
    for r in rows:
        rel_err = abs(r["n_hll"] - r["n_exact"]) / r["n_exact"]
        assert rel_err < 0.20, (r["event_type"], r["n_exact"], r["n_hll"])


def test_kmv_estimates_within_bound(spark):
    from tests.conftest import SF_DIR

    row = sketch.sketch_kmv_intersection(spark, SF_DIR).collect()[0]
    for tag in ("a", "b", "inter"):
        exact, est = row[f"exact_{tag}"], row[f"est_{tag}"]
        assert est > 0
        assert abs(est - exact) <= max(0.35 * exact, 2.0)


from blog_snapshotbackup_azuredatalake_spark.operators import sketch as _sk


@pytest.mark.parametrize("name", sorted(_sk.ORACLES))
def test_sketch_matches_oracle(spark, ddb, name):
    df = _sk.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, _sk.ORACLES[name])
