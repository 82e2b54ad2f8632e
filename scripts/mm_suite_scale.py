"""Cold multimodal-family suite run at one SF — round-6 verdict item
7: binary payload columns scale differently (shard_pack windows, CDC
chunk explode), and this was the last family without a composed scale
sweep. Documents-only input, so the de-dirs work.

    SPARK_DRIVER_MEM=48g python scripts/mm_suite_scale.py /tmp/sfbig/sf10
    SPARK_DRIVER_MEM=48g python scripts/mm_suite_scale.py /tmp/sfbig/sf30
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "mm_meta_audit",
    "mm_decode_pipeline",
    "mm_frame_sample",
    "mm_audio_chunk",
    "mm_payload_dedup",
    "mm_cdc_chunk_dedup",
    "mm_shard_pack",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else ENTRIES
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("mm-suite-scale")
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
