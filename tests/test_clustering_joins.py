"""emb_kmeans (iterative) and stream_interval_join vs batch equivalents."""

import pytest
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


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

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


def test_pca_power_shape_and_determinism(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.clustering import (
        emb_pca_power,
    )
    from tests.conftest import SF_DIR

    rows = emb_pca_power(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert rows[0]["eigenvalue"] > 0
    assert 0.0 < rows[0]["var_explained"] <= 1.0
    # unit-vector loadings: top-8 |loading| ≤ 1, ranked descending
    mags = [abs(r["loading"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert all(m <= 1.0 for m in mags)
    assert mags == sorted(mags, reverse=True)
    assert rows == emb_pca_power(spark, SF_DIR).collect()


def test_knn_graph_edges_are_topk(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        KNN_GRAPH_K,
        ann_knn_graph,
    )
    from tests.conftest import SF_DIR

    rows = ann_knn_graph(spark, SF_DIR).collect()
    per_src = {}
    for r in rows:
        assert r["src"] != r["dst"]
        assert -1.0001 <= r["cos"] <= 1.0001
        per_src.setdefault(r["src"], []).append(r)
    for src, edges in per_src.items():
        assert len(edges) <= KNN_GRAPH_K
        ranks = sorted(e["rank"] for e in edges)
        assert ranks == list(range(1, len(edges) + 1))
