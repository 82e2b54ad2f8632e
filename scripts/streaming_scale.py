"""Drive the drained-≡-batch streaming entries at a larger input with
the RocksDB state-store provider — round-6 verdict item 5: observe
STATE-STORE scaling (rows in state, state memory, drain wall time),
not just correctness, at ~10× the bench feed.

A StreamingQueryListener snapshots each query's final stateOperators
metrics; the entry wrappers themselves stay untouched (they drive the
stream to completion internally — the listener is the only way to see
state metrics without changing the driver contract).

    python scripts/streaming_scale.py /root/testdata/sf0.1 hdfs
    python scripts/streaming_scale.py /tmp/sfbig/sf1 rocksdb
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "stream_windowed_agg",
    "stream_ivm",
    "stream_interval_join",
    "stream_sessionize",
    "stream_dedup",
]

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    provider = sys.argv[2] if len(sys.argv) > 2 else "rocksdb"
    entries = sys.argv[3].split(",") if len(sys.argv) > 3 else ENTRIES

    import __spark_entry__ as entrymod
    from pyspark.sql.streaming import StreamingQueryListener

    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("streaming-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )

    # Listener events arrive asynchronously on the listener-bus thread,
    # so a late progress event from entry N's query can land after entry
    # N+1 starts (round-7 ADVICE). Key everything by query id and stamp
    # each id with the entry epoch it STARTED under — the report then
    # filters to the current epoch instead of trusting a cleared dict.
    state = {}  # query id -> state-operator metrics (last progress wins)
    epoch_of = {}  # query id -> entry epoch at onQueryStarted
    epoch = [0]

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            epoch_of[str(event.id)] = epoch[0]

        def onQueryProgress(self, event):
            p = event.progress
            ops = []
            for so in p.stateOperators:
                ops.append(
                    {
                        "op": so.operatorName,
                        "rows_total": so.numRowsTotal,
                        "mem_bytes": so.memoryUsedBytes,
                    }
                )
            if ops:
                state[str(p.id)] = ops

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    spark.streams.addListener(Capture())
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
    for name in entries:
        epoch[0] += 1
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 2)
        time.sleep(0.5)  # drain the listener bus before reading
        mine = [
            ops
            for qid, ops in state.items()
            if epoch_of.get(qid) == epoch[0]
        ]
        print(
            json.dumps(
                {
                    "q": name,
                    "sec": dt,
                    "rows_out": n,
                    "provider": provider,
                    "sf_dir": sf_dir,
                    "state": mine,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
