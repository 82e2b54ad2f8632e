"""Spot-check oracle parity at sf1 (synthesized by make_sfbig.py) for a
representative operator subset — evidence that correctness is
SF-independent, not tuned to the driver's sf0.01 gate.

    python scripts/verify_sf1_spot.py [sf_dir] [name ...]

Defaults: /tmp/sfbig/sf1 and the NEWEST operators plus one per family.
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

DEFAULT_NAMES = [
    "snap_cdc",
    "snap_table_checksum",
    "text_ngram_lm",
    "corpus_split_leakage_safe",
    "emb_pq_adc",
    "dedup_minhash",
    "q1_pricing_summary",
    "sketch_hll_distinct",
    # round-4 batch stragglers (landed after the 36/36 sf1 spot run)
    "emb_cluster_purity",
    "q_forecast_seasonal_naive",
    "source_python_stream",
    # round-5 reworked entries (blocked shard packing, IVF-RRF fusion)
    "mm_shard_pack",
    "ann_hybrid_rrf",
    # round-5 linear-contract rewrites (quadratic-answer retirements)
    "dedup_simhash",
    "dedup_embedding",
    # round-5 batch-2 additions
    "dedup_anchor_calibration",
    "corpus_dup_inflation",
    "emb_hard_negatives",
    "q_order_backlog",
    "q_supplier_lead_time",
    # round-5 batch-3/4 additions
    "corpus_near_dup_inflation",
    "source_python_udtf",
    "q_events_sliding_dau",
    "text_source_tv_divergence",
    "dq_rule_violations",
    "q_order_aging",
    "q_customer_migration",
    "snap_cross_region_lag",
    "stream_enrich_scd2",
    # round-5 final batch (capped pair contracts + new reports)
    "dedup_paragraph",
    "dedup_threshold_curve",
    "graph_triangle_estimate",
    "q_order_cohort_ltv",
    "q_events_power_users",
    "q_basket_affinity",
    # re-spot post-cap (successor contracts; dedup_minhash already above)
    "dedup_ngram_jaccard",
    "dedup_containment",
    # round-6 batch 1
    "q_revenue_concentration",
    "q_activity_heatmap",
    "text_quality_classifier",
    "emb_pair_cosine_calibration",
    "snap_deletion_vectors",
    "graph_clustering_coefficient",
    # round-6 batch 2 (time-series / behavioral suite)
    "q_events_cusum",
    "q_autocorr_daily",
    "q_shipping_sla",
    "q_interarrival_stats",
    "q_hhi_supplier",
    "q_discount_elasticity",
    "q_user_diversity",
    "q_repeat_purchase_interval",
    "q_percentile_bands",
    "q_ewma_hourly",
    "emb_diversity_moment",
    "dq_completeness",
    # round-7/8 entries (residual IVFPQ; knn graph re-spotted after the
    # round-8 norm-precompute + in-cell top-k rewrite)
    "ann_topk_ivfpq_residual",
    "ann_knn_graph",
    "emb_label_knn_classify",
    # round-9: recall entry extended with tie-aware dist_hits/dist_recall
    "ann_knn_graph_recall",
    # round-9 new entries
    "ann_ivfpq_recall",
    "corpus_epoch_roi",
    "corpus_quality_pareto",
    "corpus_anneal_schedule",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(row[i] for i in order) for row in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig/sf1"
    names = sys.argv[2:] or DEFAULT_NAMES
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        # make_sfbig writes Spark-style directories of part files;
        # driver testdata ships single-file tables — glob both
        import os

        pat = (
            f"{sf_dir}/{t}.parquet/*.parquet"
            if os.path.isdir(f"{sf_dir}/{t}.parquet")
            else f"{sf_dir}/{t}.parquet"
        )
        con.execute(f"create view {t} as select * from '{pat}'")
    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: no SQL oracle, skipped")
            continue
        df = qs[name](spark, sf_dir)
        a = norm([tuple(r) for r in df.collect()], df.columns)
        cur = con.execute(oracles[name])
        b = norm(cur.fetchall(), [d[0] for d in cur.description])
        status = "OK" if a == b else "MISMATCH"
        if a != b:
            failed.append(name)
        print(f"{name}: {status} ({len(a)} vs {len(b)} rows)", flush=True)
    print("FAILED:", failed) if failed else print("ALL OK at", sf_dir)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
