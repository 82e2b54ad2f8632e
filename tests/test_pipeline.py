"""curate_corpus composite vs DuckDB oracle + funnel sanity."""

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
