"""Decompose the dedup_minhash substrate cold-build time per stage —
round-6 verdict item 3: the composed build measured alpha 1.31
sf30→sf60 (65.3 → 162.4 s) but that number conflates five stages;
"linear by construction" needs the per-stage split to be checkable.

Stages, each materialized (persist+count or eager localCheckpoint)
so the timer brackets exactly one stage's work:

  grams    — shingle + gram fingerprints over documents (persist)
  bands    — MinHash(16) → 8-band LSH index (persist)
  cand     — successor candidates: lead() window per bucket + explode
  verify   — exact Jaccard join of candidates against gram sets
  cap      — per-doc best-K window + the report's localCheckpoint

Materializing intermediate stages costs a little vs the fused
pipeline (cand/verify normally pipeline into one shuffle round), so
the stage SUM may exceed the composed build; the per-stage ALPHAS
between SFs are the signal.

    SPARK_DRIVER_MEM=48g python scripts/minhash_decompose.py /tmp/sfbig/sf30de
    SPARK_DRIVER_MEM=48g python scripts/minhash_decompose.py /tmp/sfbig/sf60de
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
    from pyspark import StorageLevel

    from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
        _cap_per_doc,
        _docs_with_grams,
        _successor_cands,
        _verify_jaccard,
        mh_bands,
    )
    from blog_snapshotbackup_azuredatalake_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("minhash-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

    out = {"sf_dir": sf_dir}

    t0 = time.perf_counter()
    grams = _docs_with_grams(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_docs = grams.count()
    out["grams_sec"] = round(time.perf_counter() - t0, 2)
    out["n_docs"] = n_docs

    t0 = time.perf_counter()
    bands = mh_bands(grams).persist(StorageLevel.MEMORY_AND_DISK)
    out["bands_rows"] = bands.count()
    out["bands_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cand = _successor_cands(
        bands, ["band_id", "band_hash"]
    ).localCheckpoint(eager=True)
    out["cand_rows"] = cand.count()
    out["cand_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    verified = _verify_jaccard(cand, grams).localCheckpoint(eager=True)
    out["verify_rows"] = verified.count()
    out["verify_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    report = _cap_per_doc(
        verified, [F.desc("jaccard"), F.asc("doc_b")]
    ).localCheckpoint(eager=True)
    out["report_rows"] = report.count()
    out["cap_sec"] = round(time.perf_counter() - t0, 2)

    out["stage_sum_sec"] = round(
        out["grams_sec"] + out["bands_sec"] + out["cand_sec"]
        + out["verify_sec"] + out["cap_sec"], 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
