"""Cold whole-dedup-suite run at one SF — the graph-suite-style
composition measurement (VERDICT r4 #2): one fresh session, substrate
caches empty, every near-dup/CC entry in registry order, so the first
entry pays the shared grams→bands→pairs→labels build and the rest ride
the session cache exactly as a bench/production suite run would.

    SPARK_DRIVER_MEM=48g python scripts/dedup_suite_scale.py /tmp/sfbig/sf10
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_lsh_calibration",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_substring",
    "dedup_paragraph",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_anchor_calibration",
    "dedup_cluster_cc",
    "dedup_cluster_sizes",
    "dedup_keep_best",
    "corpus_split_leakage_safe",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("dedup-suite-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
    total = 0.0
    for name in ENTRIES:
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
