"""emb_kmeans (iterative) and stream_interval_join vs batch equivalents."""

import pyspark.sql.functions as F

from blog_snapshotbackup_azuredatalake_spark.operators import scale
from blog_snapshotbackup_azuredatalake_spark.operators.clustering import (
    K,
    emb_kmeans,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from blog_snapshotbackup_azuredatalake_spark.streaming.joins import (
    stream_interval_join,
)
from tests.conftest import SF_DIR


def test_kmeans_partitions_corpus_and_converges(spark):
    out = emb_kmeans(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert all(0 <= r["centroid_id"] < K for r in out)
    assert all(r["inertia"] >= 0 for r in out)
    # determinism: a rerun reproduces the exact same summary
    again = emb_kmeans(spark, SF_DIR).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_stream_interval_join_matches_batch_range_join(spark):
    """Per-purchase match counts from the streaming interval join must
    equal the batch bucket-blocked range join's counts."""
    streamed = stream_interval_join(spark, SF_DIR)
    stream_counts = {
        r["purchase_id"]: r["n"]
        for r in streamed.groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch = scale.q_range_join(spark, SF_DIR).collect()
    for r in batch:
        assert stream_counts.get(r["event_id"], 0) == r["n_recent_clicks"]
