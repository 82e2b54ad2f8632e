"""§2C curation suite vs DuckDB oracle at sf0.001, plus semantic checks."""

import pyspark.sql.functions as F
import pytest

from blog_snapshotbackup_azuredatalake_spark.operators import curation
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_curation_matches_oracle(spark, ddb, name):
    df = curation.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, curation.ORACLES[name])


def test_split_covers_corpus(spark):
    stats = curation.corpus_split(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in stats) == n_docs
    splits = {r["split"] for r in stats}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_chunks_reconstruct_token_counts(spark):
    """Each doc's chunks must cover all tokens: with overlap o and stride
    s, sum(chunk_tokens) == n + (n_chunks - 1) * o for full coverage."""
    chunks = curation.doc_chunk(spark, SF_DIR)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("chunk_tokens").alias("tok_sum"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    bad = (
        per_doc.join(docs, "doc_id")
        .filter(
            F.col("tok_sum")
            != F.col("n") + (F.col("n_chunks") - 1) * curation.CHUNK_OVERLAP
        )
        .count()
    )
    assert bad == 0


def test_centroid_assignment_partitions_corpus(spark):
    stats = curation.emb_centroid_assign(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_members"] for r in stats) == n_vecs
    assert all(0 <= r["centroid_id"] < curation.N_CENTROIDS for r in stats)


def test_emb_dim_stats_matches_oracle(spark, ddb):
    assert_matches_oracle(
        curation.emb_dim_stats(spark, SF_DIR),
        ddb,
        curation._EMB_DIM_STATS_SQL,
    )


def test_emb_dim_stats_sane(spark):
    rows = curation.emb_dim_stats(spark, SF_DIR).collect()
    assert len(rows) == curation.EMB_DIM_TOPK
    assert all(r["variance"] > 0 for r in rows)
    vs = [r["variance"] for r in rows]
    assert vs == sorted(vs, reverse=True)


def test_quota_cap_caps_every_source(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        QUOTA_N,
        corpus_quota_cap,
    )
    from tests.conftest import SF_DIR

    for r in corpus_quota_cap(spark, SF_DIR).collect():
        assert r["n_kept"] <= QUOTA_N
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] == min(r["n_docs"], QUOTA_N)


def test_shard_shuffle_covers_and_balances(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        SHUFFLE_SHARDS,
        corpus_shard_shuffle,
    )
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    rows = corpus_shard_shuffle(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert {r["shard"] for r in rows} == set(range(SHUFFLE_SHARDS))
    assert sum(r["n_docs"] for r in rows) == n_docs
    # hash-uniform balance: no shard beyond 2x the mean
    mean = n_docs / SHUFFLE_SHARDS
    assert all(r["n_docs"] < 2 * mean for r in rows)
    # deterministic: the certificate is a pure function of doc ids
    again = corpus_shard_shuffle(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_semantic_decontamination_flags_planted_leak(spark, tmp_path):
    """A corpus vector nearly identical to a bench vector must be
    flagged; orthogonal vectors must not. Planted embeddings, since
    the synthetic table's random vectors never reach the threshold."""
    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        corpus_decontaminate_semantic,
    )

    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e1_noisy = [0.99] + [0.01] * (dim - 1)  # cos ≈ 0.999 vs e1
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [
        (20, e1, 7),        # bench (vec_id % 20 == 0)
        (1, e1_noisy, 7),   # corpus: planted leak of the bench vector
        (2, e2, 7),         # corpus: orthogonal, clean
        (3, e2, 8),         # corpus: clean, other label
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in
           corpus_decontaminate_semantic(spark, str(tmp_path)).collect()}
    assert out[7]["n_corpus"] == 2 and out[7]["n_contaminated"] == 1
    assert out[8]["n_contaminated"] == 0
    assert out[7]["top_cos"] > 0.99


def test_emb_outlier_flags_planted_corrupt_vector(spark, tmp_path):
    """A vector far outside the corpus distribution must be flagged;
    in-distribution vectors must not (random synthetic embeddings
    never cross the threshold, so the outlier is planted)."""
    import random

    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        emb_outlier_zscore,
    )

    rng = random.Random(7)
    dim = 8
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], 1) for i in range(40)
    ]
    rows.append((99, [50.0] * dim, 1))  # corrupt: ~50σ out on every dim
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in
           emb_outlier_zscore(spark, str(tmp_path)).collect()}
    assert out[1]["n_vecs"] == 41
    assert out[1]["n_outliers"] == 1


def test_token_budget_flags_small_source_over_repetition(spark, tmp_path):
    """sqrt flattening boosts a tiny source's share above its token
    share, so under a 3x budget the tiny source exceeds the 4-epoch
    ceiling while the big one stays under it."""
    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        corpus_token_budget_plan,
    )

    big = [(i, "w " * 99 + "w", "en", "big", 200) for i in range(100)]
    tiny = [(1000, "w " * 99 + "w", "en", "tiny", 200)]
    spark.createDataFrame(
        big + tiny,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {r["source"]: r for r in
            corpus_token_budget_plan(spark, str(tmp_path)).collect()}
    # weights: big=sqrt(10000)=100, tiny=sqrt(100)=10 → tiny gets ~9.1%
    # of a 30300-token budget ≈ 2754 tokens on 100 available ≈ 27 epochs
    assert rows["tiny"]["data_constrained"]
    assert not rows["big"]["data_constrained"]
    assert rows["tiny"]["repeat_factor"] > rows["big"]["repeat_factor"]


def test_source_overlap_matrix_invariants(spark):
    rows = curation.corpus_source_overlap(spark, SF_DIR).collect()
    by_pair = {(r["source_a"], r["source_b"]): r for r in rows}
    for (a, b), r in by_pair.items():
        if a == b:
            # diagonal: a source fully contains itself
            assert r["containment_a"] == 1.0 and r["jaccard"] == 1.0, r
        # shared counts are symmetric; containment need not be
        mirror = by_pair.get((b, a))
        assert mirror is not None and mirror["n_shared"] == r["n_shared"]
        assert 0.0 < r["jaccard"] <= 1.0


def test_importance_resample_prefers_target_vocab(spark, tmp_path):
    """A candidate sharing the target source's vocabulary must outrank
    one with disjoint vocabulary (modulo 64-bucket hashing, which is
    deterministic — verified once, stable forever)."""
    tgt = [
        (i, "alpha beta gamma delta " * 10 + "alpha", "en",
         curation.DSIR_TARGET, 200)
        for i in range(10)
    ]
    like = [(100, "alpha beta gamma delta alpha beta", "en", "raw", 40)]
    unlike = [(101, "zet eta theta iota kappa lam", "en", "raw", 40)]
    spark.createDataFrame(
        tgt + like + unlike,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = curation.corpus_importance_resample(spark, str(tmp_path)).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == {100, 101}  # target docs never resampled
    assert by_id[100]["avg_ratio_fp"] > by_id[101]["avg_ratio_fp"]
    assert by_id[100]["rank"] == 1
    for r in rows:
        assert r["avg_ratio_fp"] == r["score_fp"] // r["n_grams"]


def test_label_drift_planted_shift_dominates(spark, tmp_path):
    """A label whose vectors are uniformly offset must show the largest
    drift, in the dimension that was shifted."""
    base = [(i, [0.1] * 64, 0) for i in range(40)]
    # label 1 shifted by +2.0 in dim 7 (1-based) only
    shifted = [
        (100 + i, [0.1] * 6 + [2.1] + [0.1] * 57, 1) for i in range(10)
    ]
    spark.createDataFrame(
        base + shifted, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    rows = {r["label"]: r for r in
            curation.emb_label_drift(spark, str(tmp_path)).collect()}
    assert rows[1]["drift_sq_fp2"] > rows[0]["drift_sq_fp2"]
    assert rows[1]["top_dim"] == 7
    assert rows[1]["top_dim_drift_fp"] > 0  # shifted above the corpus mean


def test_version_diff_branches_all_exercised_and_consistent(spark):
    rows = curation.corpus_version_diff(spark, SF_DIR).collect()
    assert rows
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    # the mutation rules guarantee every branch fires somewhere
    assert all(v > 0 for v in tot.values())
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n_v1 = docs.count()
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_v1
    n_v2 = curation._documents_v2(docs).count()
    assert tot["n_added"] + tot["n_changed"] + tot["n_unchanged"] == n_v2
    # added docs are truncated copies; removals drop whole docs → the
    # corpus can only lose token mass overall under this mutation
    assert sum(r["token_delta"] for r in rows) < 0


def test_emb_diversity_single_vector_label_is_null(spark, tmp_path):
    """A label with exactly one vector has no pairs — the guard must
    emit NULL (not 0/0 NaN), and a tight 3-identical-vector label must
    report avg pairwise cosine ≈ 1 (moment identity sanity)."""
    from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
        emb_diversity_moment,
    )

    unit = [1.0 / 8.0] * 64  # 64-dim unit vector (64 · (1/8)² = 1)
    rows = [(0, unit, 1)] + [(i, unit, 2) for i in range(1, 4)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in
           emb_diversity_moment(spark, str(tmp_path)).collect()}
    assert out[1]["n_vectors"] == 1
    assert out[1]["avg_pairwise_cosine"] is None
    assert out[2]["n_vectors"] == 3
    assert abs(out[2]["avg_pairwise_cosine"] - 1.0) < 1e-3
