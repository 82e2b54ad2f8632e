"""Cold whole-graph-suite run at one SF — the composition measurement
that caught the 66 GB triangle wedge shuffle in round 4: one fresh
session, substrate caches empty, every graph entry in consumer order so
the first consumer pays each substrate build (co-purchase edges, kNN
edges, LPA labels) and the rest ride the session cache.

    SPARK_DRIVER_MEM=48g python scripts/graph_suite_scale.py /tmp/sfbig/sf30
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "graph_degree_stats",
    "graph_triangle_count",
    "graph_bfs_reach",
    "graph_kcore",
    "graph_community_lpa",
    "graph_modularity",
    "graph_assortativity",
    "graph_cc_census",
    "graph_pagerank",
    "graph_link_predict",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else ENTRIES
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("graph-suite-scale")
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
