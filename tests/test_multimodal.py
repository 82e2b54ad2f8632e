"""Multimodal binary plumbing: schema, determinism, round-trip of the
synthetic header through the mapInPandas decode."""

from blog_snapshotbackup_azuredatalake_spark.operators import multimodal
from tests.conftest import SF_DIR


def test_decode_pipeline_round_trips_metadata(spark):
    df = multimodal.mm_decode_pipeline(spark, SF_DIR)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 500
    for doc_id, r in list(rows.items())[:50]:
        assert r["width"] == (doc_id % 8 + 1) * 32
        assert r["height"] == (doc_id % 5 + 1) * 32
        assert r["fmt"] in ("png", "jpeg", "webp")
        assert r["n_bytes"] == 12 + 64
        assert 0.0 <= r["mean_byte"] <= 255.0
        assert max(r["thumb_width"], r["thumb_height"]) == 32
        assert len(r["frame_hash"]) == 32


def test_decode_pipeline_deterministic(spark):
    a = sorted(map(tuple, multimodal.mm_decode_pipeline(spark, SF_DIR).collect()))
    b = sorted(map(tuple, multimodal.mm_decode_pipeline(spark, SF_DIR).collect()))
    assert a == b
