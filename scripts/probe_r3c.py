"""Round-3 session-4 scale probe: new operators at sf1/sf3.

    python scripts/probe_r3c.py [keys_csv] [sf_dir ...]

Warm session, noop sink, min-of-2 runs per (query, sf). Prints one
line per measurement and a final alpha table (log-slope between the
two largest SFs).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

KEYS = [
    "q_events_ohlc",
    "stream_ohlc",
    "graph_degree_stats",
    "graph_bfs_reach",
    "text_boilerplate",
    "dq_mad_outlier",
    "dq_hourly_profile",
    "corpus_version_diff",
    "snap_format_roundtrip",
]


def main() -> None:
    keys = sys.argv[1].split(",") if len(sys.argv) > 1 else KEYS
    sf_dirs = sys.argv[2:] or ["/tmp/sfbig/sf1", "/tmp/sfbig/sf3"]

    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("probe_r3c")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sfs = [
        float(os.path.basename(d.rstrip("/")).replace("sf", ""))
        for d in sf_dirs
    ]
    times: dict[str, list[float]] = {k: [] for k in keys}
    for sf_dir in sf_dirs:
        for k in keys:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[k](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[k].append(round(best, 2))
            print(f"{sf_dir} {k}: {times[k][-1]} s", flush=True)

    print("\n| query | " + " | ".join(f"sf{s} (s)" for s in sfs) + " | alpha |")
    for k in keys:
        ts = times[k]
        alpha = (
            math.log(ts[-1] / ts[-2]) / math.log(sfs[-1] / sfs[-2])
            if len(ts) >= 2 and ts[-2] > 0
            else float("nan")
        )
        print(
            f"| {k} | " + " | ".join(str(t) for t in ts)
            + f" | {alpha:.2f} |"
        )


if __name__ == "__main__":
    main()
