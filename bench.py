"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced with a noop-format write so the full plan executes
(scan → shuffle → sink) without driver-side collect overhead — the same
shape a cluster run would have.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # one warm-up action so JVM/codegen startup doesn't land on the first query
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    total = 0.0
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
        except Exception as exc:  # record the failure, keep benching
            timings[name] = -1.0
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total wall-clock over all registered queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
