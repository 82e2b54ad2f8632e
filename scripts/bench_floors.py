"""Pre-drive isolated floors for the bench heavies — round-7 verdict
item 3: the driver's round-7 bench read +31% purely from the box's
slow phase, and the call was only decidable because the judge
re-measured four entries by hand. This records the evidence IN THE
REPO before every driver bench: a clean-box (guarded) min-of-2 for the
top-N most expensive entries of the last bench, in one fresh session
with the same noop-write timing loop bench.py uses. If a driver bench
then lands far above these floors on untouched code, the gap is
attributable to environment on sight.

    python scripts/bench_floors.py [sf_dir] [top_n] [prefixes]
    # default: /root/testdata/sf0.1, top 10 of bench_timings.json,
    # plus EVERY entry matching the comma-separated family prefixes
    # (default "stream_" — round-9 verdict item 2: the streaming family
    # drifted 1.5-2.5x in the r9 driver bench and the floors table
    # could not attribute it because it only covered the batch top-10)

Prints one JSON line per entry and a final markdown table ready for
SCALING.md's round section.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from _guard import assert_no_spark_jvm  # noqa: E402


def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    with open(os.path.join(REPO, "bench_timings.json")) as fh:
        last = json.load(fh)["queries"]
    heavies = [
        k
        for k, v in sorted(last.items(), key=lambda kv: -kv[1])
        if v > 0
    ][:top_n]
    prefixes = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["stream_"]
    )
    heavies += [
        k
        for k in sorted(last)
        if any(k.startswith(p) for p in prefixes if p)
        and k not in heavies
    ]

    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("bench-floors")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

    rows = []
    for name in heavies:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, last[name], round(best, 2)))
        print(
            json.dumps(
                {"q": name, "last_bench": last[name], "floor": rows[-1][2]}
            ),
            flush=True,
        )

    print("\n| entry | last driver bench (s) | isolated floor (s) |")
    print("| --- | --- | --- |")
    for name, prev, floor in rows:
        print(f"| {name} | {prev} | {floor} |")


if __name__ == "__main__":
    main()
