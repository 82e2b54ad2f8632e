"""§2A snapshot/backup suite vs DuckDB oracle at sf0.001."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.operators import snapshot
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(snapshot.QUERIES))
def test_snapshot_matches_oracle(spark, ddb, name):
    df = snapshot.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, snapshot.ORACLES[name])


def test_snap_diff_classifies_all_three(spark):
    df = snapshot.snap_diff(spark, SF_DIR)
    kinds = {r["change_type"] for r in df.collect()}
    assert kinds == {"added", "removed", "changed"}


def test_bloom_prefilter_no_false_negatives(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators.snapshot import (
        snap_bloom_prefilter,
    )

    row = snap_bloom_prefilter(spark, SF_DIR).collect()[0]
    # bloom-absent must imply truly-new: definite_new ≤ truly_new, and
    # every truly-new row is either definite-new or a false positive
    assert row["n_definite_new"] <= row["n_truly_new"]
    assert (
        row["n_definite_new"] + row["n_false_positive"] == row["n_truly_new"]
    )
    assert row["n_definite_new"] + row["n_maybe"] == row["n_source"]


def test_apply_incremental_reaches_target_state(spark):
    row = snapshot.snap_apply_incremental(spark, SF_DIR).collect()[0]
    # the merge must provably reproduce the target snapshot, and the
    # change batch must be non-trivial in both directions
    assert row["state_match"] is True
    assert row["n_upserts"] > 0 and row["n_deletes"] > 0
    assert row["n_merged"] == row["n_target"]


def test_chain_rebase_reaches_final_state(spark):
    row = snapshot.snap_chain_rebase(spark, SF_DIR).collect()[0]
    # folding the 2-batch chain must provably reproduce the direct v2
    # state, with non-trivial work in both batches and both directions
    assert row["state_match"] is True
    assert row["n_batches"] == 2
    assert row["n_upserts"] > 0 and row["n_deletes"] > 0


def test_merge_upsert_delete_wins_on_feed_overlap(spark):
    """Keys hit by BOTH feed rules (upsert %97 and delete %89≡3 — the
    first exists at every ≡r mod 8633 id) must carry only the delete:
    real MERGE INTO rejects multiple source matches per key, so the
    feed deduplicates with explicit delete-wins precedence. sf0.001
    has no overlap keys, so this drives sf0.01 where two exist."""
    import duckdb

    sf01 = "/root/testdata/sf0.01"
    overlap = {
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{sf01}/orders.parquet' "
            "WHERE o_orderkey % 97 = 0 AND o_orderkey % 89 = 3"
        ).fetchall()
    }
    assert overlap, "fixture regression: expected overlap keys at sf0.01"
    out = snapshot.snap_merge_upsert(spark, sf01)
    hit = out.filter(out.o_orderkey.isin(list(overlap))).collect()
    assert hit == [], f"overlap keys must be deleted, got {hit}"


def test_merkle_locates_corruption(spark):
    rows = snapshot.snap_verify_merkle(spark, SF_DIR).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert len(rows) == 127 and len(by_level[0]) == 1
    # backup is perturbed, so the root must mismatch; and every
    # mismatching parent must have a mismatching child (the drill-down
    # invariant that makes log-time localization work)
    assert by_level[0][0]["match"] is False
    for lvl in range(0, 6):
        for parent in by_level[lvl]:
            if parent["match"] is False:
                kids = [
                    k
                    for k in by_level[lvl + 1]
                    if k["idx"] in (parent["idx"] * 2, parent["idx"] * 2 + 1)
                ]
                assert any(not k["match"] for k in kids)


def test_cdc_feed_invariants(spark):
    rows = snapshot.snap_cdc(spark, SF_DIR).collect()
    by = {}
    for r in rows:
        by[(r["version"], r["change_type"])] = (
            by.get((r["version"], r["change_type"]), 0) + 1
        )
    for v in (1, 2):
        # every update ships both images
        assert by[(v, "update_preimage")] == by[(v, "update_postimage")]
        assert by[(v, "insert")] > 0 and by[(v, "delete")] > 0
    # perturbation spec caps synthetic inserts at 50 (v1) / 30 (v2)
    assert 0 < by[(1, "insert")] <= 50 and 0 < by[(2, "insert")] <= 30


def test_ivm_maintains_exactly(spark):
    rows = snapshot.snap_ivm(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per o_orderpriority
    assert all(r["is_consistent"] for r in rows)
    # the feed really changed things: some group moved
    assert any(r["dn"] != 0 for r in rows)


def test_scd2_intervals_cover_every_state_row(spark):
    """Conservation law: Σ interval_length × count over the history
    equals the total number of (key, version) state rows — every
    observed row lives in exactly one interval."""
    from blog_snapshotbackup_azuredatalake_spark.operators.snapshot import (
        _perturbed_orders,
        _perturbed_orders_v2,
        snap_scd2_history,
    )
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    rows = snap_scd2_history(spark, SF_DIR).collect()
    covered = sum(
        (r["valid_to"] - r["valid_from"] + 1) * r["n_intervals"]
        for r in rows
    )
    total = (
        load_table(spark, SF_DIR, "orders").count()
        + _perturbed_orders(spark, SF_DIR).count()
        + _perturbed_orders_v2(spark, SF_DIR).count()
    )
    assert covered == total
    # current intervals are exactly those ending at HEAD
    assert all(r["is_current"] == (r["valid_to"] == 2) for r in rows)


def test_branch_merge_key_conservation_and_conflicts(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    from pyspark.sql import functions as F

    rows = snapshot.snap_branch_merge(spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    base = orders.count()
    # every key in base ∪ A ∪ B is classified exactly once: base keys
    # plus each branch's synthetic adds (≤ 50 each — the LIMIT caps,
    # the mod filter may yield fewer at small SFs)
    adds_a = min(50, orders.filter(F.col("o_orderkey") % 101 == 7).count())
    adds_b = min(50, orders.filter(F.col("o_orderkey") % 103 == 11).count())
    assert sum(r["n_keys"] for r in rows) == base + adds_a + adds_b
    for r in rows:
        if r["outcome"] == "conflict_a_wins":
            # a conflict requires BOTH branches to have touched the key
            assert r["state_a"] in ("changed", "deleted", "added")
            assert r["state_b"] in ("changed", "deleted", "added")
        # deletions drop out of the merged state, everything else lands
        winner = (
            r["state_a"]
            if r["state_a"] not in ("same", "absent")
            else (r["state_b"] if r["state_b"] not in ("same", "absent")
                  else "same")
        )
        if r["outcome"] == "conflict_a_wins":
            winner = r["state_a"]
        expected = 0 if winner == "deleted" else r["n_keys"]
        assert r["n_merged_rows"] == expected, r
    clean_same = [r for r in rows
                  if (r["state_a"], r["state_b"]) == ("same", "same")]
    assert clean_same and clean_same[0]["n_keys"] == max(
        r["n_keys"] for r in rows
    )


def test_ttl_enforce_cutoffs_ordered_and_certified(spark):
    rows = snapshot.snap_ttl_enforce(spark, SF_DIR).collect()
    by_type = {r["event_type"]: r for r in rows}
    assert by_type["click"]["ttl_days"] == 30
    assert by_type["view"]["ttl_days"] == 60
    for r in rows:
        assert r["n_purged"] + r["n_kept"] == r["n_total"]
        if r["min_kept_ts_us"] is not None:
            assert r["min_kept_ts_us"] >= r["cutoff_us"]
    # shorter TTL => later cutoff (measured back from the same max)
    assert by_type["click"]["cutoff_us"] > by_type["view"]["cutoff_us"]
