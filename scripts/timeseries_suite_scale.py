"""Cold whole-timeseries-suite run at one SF — the same composition
measurement the dedup/graph/text families have (one fresh session,
every plans/timeseries.py entry in registry order, no substrate
caches). Every entry's contract collapses the raw scan to a bounded
series (hours/days/brands/buckets) before any global-order window or
self-join, so the expected shape is scan-dominated: alpha ≈ 1.0 per
doubling, with the window/join stages flat. Anything super-linear
flags a contract that secretly scales with rows, not with the series.

    SPARK_DRIVER_MEM=48g python scripts/timeseries_suite_scale.py /tmp/sfbig/sf10full
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "q_events_cusum",
    "q_ewma_hourly",
    "q_interarrival_stats",
    "q_user_diversity",
    "q_autocorr_daily",
    "q_repeat_purchase_interval",
    "q_shipping_sla",
    "q_hhi_supplier",
    "q_discount_elasticity",
    "q_percentile_bands",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("timeseries-suite-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm JVM
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
