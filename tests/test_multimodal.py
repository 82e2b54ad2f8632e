"""Multimodal binary plumbing: schema, determinism, round-trip of the
synthetic header through the mapInPandas decode."""

import pytest
from blog_snapshotbackup_azuredatalake_spark.operators import multimodal
from tests.conftest import SF_DIR, assert_matches_oracle


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


def test_mm_meta_audit_matches_oracle(spark, ddb):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        multimodal.mm_meta_audit(spark, SF_DIR),
        ddb,
        multimodal._MM_META_AUDIT_SQL,
    )


def test_mm_meta_audit_clean(spark):
    rows = multimodal.mm_meta_audit(spark, SF_DIR).collect()
    assert {r["fmt"] for r in rows} == {"png", "jpeg", "webp"}
    assert all(r["n_mismatch"] == 0 for r in rows)


def test_mm_frame_sample_counts(spark):
    import math

    docs = multimodal.load_table(spark, SF_DIR, "documents")
    expected = sum(
        math.ceil((doc_id % 7 + 2) / multimodal.FRAME_SAMPLE_EVERY)
        for (doc_id,) in docs.select("doc_id").collect()
    )
    frames = multimodal.mm_frame_sample(spark, SF_DIR)
    assert frames.count() == expected
    # sampled frames only, deterministic hashes per (doc, frame)
    rows = frames.collect()
    assert all(r["frame_no"] % multimodal.FRAME_SAMPLE_EVERY == 0 for r in rows)
    assert all(r["ts_ms"] == r["frame_no"] * multimodal.FRAME_MS for r in rows)
    again = {
        (r["doc_id"], r["frame_no"]): r["frame_md5"]
        for r in multimodal.mm_frame_sample(spark, SF_DIR).collect()
    }
    assert {(r["doc_id"], r["frame_no"]): r["frame_md5"] for r in rows} == again


def test_payload_dedup_finds_shared_media(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.multimodal import (
        mm_payload_dedup,
    )
    from tests.conftest import SF_DIR

    rows = mm_payload_dedup(spark, SF_DIR).collect()
    assert sum(r["n_dup_payloads"] for r in rows) > 0
    for r in rows:
        assert r["n_distinct"] <= r["n_payloads"]
        assert r["max_group"] >= 1


def test_audio_chunk_windows(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.multimodal import (
        AUDIO_CHUNK_MS,
        AUDIO_OVERLAP_MS,
        mm_audio_chunk,
    )
    from tests.conftest import SF_DIR

    rows = mm_audio_chunk(spark, SF_DIR).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    step = AUDIO_CHUNK_MS - AUDIO_OVERLAP_MS
    for doc_id, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        for i, r in enumerate(rs):
            assert r["start_ms"] == i * step
            assert r["end_ms"] - r["start_ms"] <= AUDIO_CHUNK_MS
            # every window past the first must add new audio
            if i > 0:
                assert r["end_ms"] - r["start_ms"] > AUDIO_OVERLAP_MS
        # consecutive windows overlap by exactly AUDIO_OVERLAP_MS
        # (a non-tail window always spans the full AUDIO_CHUNK_MS)
        for a, b in zip(rs, rs[1:]):
            assert a["end_ms"] - b["start_ms"] == AUDIO_OVERLAP_MS
    # determinism
    again = mm_audio_chunk(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cdc_chunking_recovers_shifted_blocks(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.multimodal import (
        mm_cdc_chunk_dedup,
    )

    rows = mm_cdc_chunk_dedup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["cdc_distinct"] <= r["cdc_total"]
        assert r["fixed_distinct"] <= r["fixed_total"]
    # the shifted shared block is recoverable by CDC, not by fixed
    # offsets: corpus-wide, CDC must dedup strictly more chunk mass
    cdc = sum(r["cdc_total"] - r["cdc_distinct"] for r in rows) / sum(
        r["cdc_total"] for r in rows
    )
    fixed = sum(r["fixed_total"] - r["fixed_distinct"] for r in rows) / sum(
        r["fixed_total"] for r in rows
    )
    assert cdc > fixed, (cdc, fixed)


def test_mm_shard_pack_matches_oracle(spark, ddb):
    from tests.conftest import assert_matches_oracle

    df = multimodal.mm_shard_pack(spark, SF_DIR)
    assert_matches_oracle(df, ddb, multimodal.ORACLES["mm_shard_pack"])


def test_mm_shard_pack_manifest_invariants(spark):
    rows = multimodal.mm_shard_pack(spark, SF_DIR).collect()
    stride = multimodal.MM_BLOCK_STRIDE
    by_stream = {}
    for r in rows:
        block, seq = divmod(r["shard_id"], stride)
        assert 0 <= block < multimodal.MM_PACK_BLOCKS
        by_stream.setdefault((r["source"], block), []).append((seq, r))
    for (source, block), shards in by_stream.items():
        ids = sorted(seq for seq, _ in shards)
        assert ids == list(range(len(ids))), (
            f"{source}/{block}: gaps in shard seqs"
        )
        shards.sort()
        # id ranges must be disjoint and ordered WITHIN a packing
        # stream (append-stable greedy first-fit per (source, block))
        for (_, a), (_, b) in zip(shards, shards[1:]):
            assert a["last_doc"] < b["first_doc"]
        for _, s in shards[:-1]:
            assert s["shard_bytes"] > 0


# a genuine 1x1 red-pixel PNG (67 bytes) for the real-decoder path
_REAL_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000100000001080200000090"
    "7753de0000000c49444154789c63f8cfc0000000030001a5a5d99b000000"
    "0049454e44ae426082"
)


def test_decode_routes_real_containers_by_magic():
    """Synthetic ASCII headers always stub-decode; a real PNG either
    decodes via the probed library or raises loudly — never silently
    falls through to the stub parser."""
    import pytest as _pytest

    if multimodal.MM_REAL_DECODE:
        fmt, w, h, pixels = multimodal._decode_payload(_REAL_PNG)
        assert (fmt, w, h) == ("png", 1, 1)
        assert len(pixels) > 0
    else:
        with _pytest.raises(NotImplementedError):
            multimodal._decode_payload(_REAL_PNG)
    # the stub contract is unchanged either way
    synth = b"00320064png." + b"\x01" * 64
    assert multimodal._decode_payload(synth) == (
        "png", 32, 64, b"\x01" * 64
    )


from blog_snapshotbackup_azuredatalake_spark.operators import multimodal as _mm


@pytest.mark.parametrize("name", sorted(_mm.ORACLES))
def test_multimodal_matches_oracle(spark, ddb, name):
    df = _mm.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, _mm.ORACLES[name])
