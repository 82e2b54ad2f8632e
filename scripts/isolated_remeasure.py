"""Clean-session isolated min-of-2 re-measure — round-6 verdict item
2: dedup_keep_best and corpus_split_leakage_safe measured alpha >1.3
at sf60 INSIDE the dedup suite (three substrate caches resident,
executor-storage pressure suspected — the class the graph-suite
modularity flag resolved to). The repo's burned-in rule is "suite
numbers nominate, isolated min-of-2 decides": fresh session, build
ONLY the substrate chain the entry needs (first run pays it), then a
second run rides the warm substrate — min-of-2 is the entry's own
cost with its contractual cache resident and nothing else.

    SPARK_DRIVER_MEM=48g python scripts/isolated_remeasure.py \
        /tmp/sfbig/sf60 dedup_keep_best [n_runs]
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    key = sys.argv[2]
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("isolated-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 2)
        times.append(dt)
        print(json.dumps({"q": key, "run": i, "sec": dt,
                          "sf_dir": sf_dir}), flush=True)
    print(json.dumps({"q": key, "min_sec": min(times),
                      "runs": times, "sf_dir": sf_dir}), flush=True)


if __name__ == "__main__":
    main()
