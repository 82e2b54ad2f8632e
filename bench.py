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
        try:
            # min of two runs: single-run numbers swing ±20% with
            # scheduler/GC noise on a shared box; the min is the
            # steady-state plan cost (first run still includes planning)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            total += best
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
