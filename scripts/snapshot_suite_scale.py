"""Cold whole-lifecycle-suite run for the snapshot/snapshot_manager
family at one SF — round-6 verdict item 4: the txn-log store and its
certificates had never been observed past sf0.1, and snap_restore_drill
(restores EVERY chain version by contract) was already the #5 bench
heavy. One fresh session; entries run in lifecycle order — manifest/
checksum primitives, diff/incremental plans, chain builders, then the
materialized manager lifecycles (txn log, vacuum, clone, restore
drill, conflict certificates) that write real snapshot chains to
scratch dirs.

    SPARK_DRIVER_MEM=48g python scripts/snapshot_suite_scale.py /tmp/sfbig/sf10full
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    # manifest / checksum primitives
    "snap_row_manifest",
    "snap_table_checksum",
    # plan-level incrementals and verification
    "snap_incr_watermark",
    "snap_diff",
    "snap_incr_antijoin",
    "snap_bloom_prefilter",
    "snap_verify_merkle",
    "snap_verify_sampled",
    # chain plans
    "snap_retention",
    "snap_ttl_enforce",
    "snap_restore_asof",
    "snap_apply_incremental",
    "snap_chain_rebase",
    "snap_partition_stats",
    # CDC / IVM / SCD2 / merge
    "snap_cdc",
    "snap_ivm",
    "snap_scd2_history",
    "snap_scd2_asof_join",
    "snap_merge_upsert",
    "snap_branch_merge",
    "snap_deletion_vectors",
    "snap_cross_region_lag",
    # materialized manager lifecycles (txn-log store, real writes)
    "snap_txn_log",
    "snap_txn_conflict",
    "snap_vacuum",
    "snap_clone",
    "snap_restore_drill",
    # sink round-trips (real writes at this SF)
    "snap_copy_roundtrip",
    "snap_partitioned_prune",
    "snap_format_roundtrip",
    "snap_merge_schema_evolve",
    "snap_file_manifest_sync",
    "snap_schema_drift",
    "snap_gdpr_delete",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else ENTRIES
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("snapshot-suite-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
    total = 0.0
    for name in entries:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 2)
        total += dt
        print(json.dumps({"q": name, "sec": dt, "sf_dir": sf_dir}),
              flush=True)
    print(json.dumps({"suite_total_sec": round(total, 2),
                      "sf_dir": sf_dir}), flush=True)


if __name__ == "__main__":
    main()
