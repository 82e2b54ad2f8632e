"""Cold whole-similarity-suite run at one SF — the composition
measurement the round-6 verdict ordered for the ANN/embedding family:
every family swept this way so far (text, timeseries, dedup, graph)
surfaced a real defect on its FIRST cold composed run that per-entry
sf0.1 curves could not show (estimate-blind broadcasts, Decimal128 hot
paths, quadratic pair contracts, broadcast-budget fatalities).

One fresh session, substrate caches empty; entries run in consumer
order so the first consumer pays each substrate build (IVF centroid
literals, PQ codebooks, kNN bucket graph) and the rest ride the
session cache — exactly how a production pipeline composes them.

    SPARK_DRIVER_MEM=48g python scripts/similarity_suite_scale.py /tmp/sfbig/sf10full
    SPARK_DRIVER_MEM=48g python scripts/similarity_suite_scale.py /tmp/sfbig/sf30de
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    # exact baseline first (most expensive touch of the corpus)
    "ann_topk_bruteforce",
    "ann_topk_arrow",
    # hash / coarse-quantized index paths
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_ivf_trained",
    "ann_filtered_search",
    "ann_nprobe_curve",
    "ann_index_balance",
    "ann_ivf_upsert",
    # product quantization family
    "emb_pq_adc",
    "emb_pq_residual_audit",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_residual",
    "ann_ivfpq_recall",
    # graph / audit consumers
    "ann_knn_graph",
    "ann_recall_audit",
    "ann_range_search",
    # scalar / binary compression
    "emb_binary_hamming",
    "emb_quantize_sq8",
    "emb_truncation_audit",
    # label-space consumers
    "emb_label_knn_classify",
    "emb_mmr_diversify",
    "emb_hard_negatives",
    "emb_pair_cosine_calibration",
    "ann_hybrid_rrf",
    # embedding-curation consumers (same substrate family)
    "emb_centroid_assign",
    "emb_cluster_purity",
    "emb_silhouette_lite",
    "emb_dim_stats",
    "emb_whiten",
    "emb_outlier_zscore",
    "emb_label_drift",
    "emb_diversity_moment",
    "corpus_decontaminate_semantic",
    # iterative (driver-loop) entries last — bounded rounds by contract
    "emb_kmeans",
    "emb_pca_power",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else ENTRIES
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("similarity-suite-scale")
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
