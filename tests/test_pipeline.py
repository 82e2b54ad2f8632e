"""curate_corpus composite vs DuckDB oracle + funnel sanity."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.operators import pipeline
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_curate_corpus_matches_oracle(spark, ddb):
    df = pipeline.curate_corpus(spark, SF_DIR)
    assert_matches_oracle(df, ddb, pipeline.ORACLES["curate_corpus"])


def test_curate_corpus_is_a_strict_funnel(spark):
    stats = pipeline.curate_corpus(spark, SF_DIR).collect()
    survivors = sum(r["n_docs"] for r in stats)
    total = load_table(spark, SF_DIR, "documents").count()
    assert 0 < survivors < total  # both filter stages must bite
    assert {r["split"] for r in stats} <= {"train", "val", "test"}


def test_filter_funnel_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.operators import pipeline

    df = pipeline.corpus_filter_funnel(spark, SF_DIR)
    assert_matches_oracle(df, ddb, pipeline.ORACLES["corpus_filter_funnel"])


def test_filter_funnel_is_monotone_and_consistent_with_curate(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators import pipeline

    rows = sorted(
        pipeline.corpus_filter_funnel(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "quality_gate", "near_dup_removal",
    ]
    surv = [r["n_surviving"] for r in rows]
    assert surv[0] >= surv[1] >= surv[2] > 0
    for prev, r in zip(surv, rows[1:]):
        assert prev - r["n_surviving"] == r["n_dropped"]
    # the funnel's final survivor count must equal curate_corpus mass
    curated = pipeline.curate_corpus(spark, SF_DIR).collect()
    assert surv[2] == sum(r["n_docs"] for r in curated)


from blog_snapshotbackup_azuredatalake_spark.operators import pipeline as _pl


@pytest.mark.parametrize("name", sorted(_pl.ORACLES))
def test_pipeline_matches_oracle(spark, ddb, name):
    df = _pl.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, _pl.ORACLES[name])
