"""ann_knn_graph width-step instrumentation — round-7 verdict item 1.

The one confirmed super-linear edge in the repo: ann_knn_graph's clean
sf30->sf60 alpha ~1.2 (403.6 s at sf60). Hypothesis from round 2's
docs: between adaptive sign-LSH width steps candidate pairs grow
~ n^2/2^d, with the per-bucket occupancy cap bounding the worst case
at n*CAP. This prints the evidence the verdict asked for — bucket
width d, bucket/pattern counts, capped-bucket counts, and EXACT
candidate-pair totals (sum over (pat,sub) of c*(c-1), identical to the
self-join's row count) — at the operator's chosen d and at d+/-1, so
the "step earlier" fix can be priced before it's made.

    python scripts/knn_width_probe.py /tmp/sfbig/sf30de /tmp/sfbig/sf60de

One JSON line per (sf_dir, d). Pure aggregations — no self-join runs.
"""
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from _guard import assert_no_spark_jvm  # noqa: E402


def probe(spark, sf_dir: str) -> None:
    import pyspark.sql.functions as F

    from blog_snapshotbackup_azuredatalake_spark.functions.hashing import (
        md5_int60,
    )
    from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
        _sign_bucket,
    )
    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        KNN_BUCKET_CAP,
        _knn_graph_dims,
        load_table,
    )

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    base = base.persist()
    n = base.count()
    d0 = _knn_graph_dims(n)
    for d in (d0 - 1, d0, d0 + 1, d0 + 2):
        patted = base.select(
            "vec_id", _sign_bucket(F.col("embedding"), d).alias("pat")
        )
        bc = patted.groupBy("pat").agg(F.count(F.lit(1)).alias("bc"))
        sub = patted.join(
            F.broadcast(bc.filter(F.col("bc") > KNN_BUCKET_CAP)),
            "pat",
            "left",
        ).select(
            "pat",
            F.coalesce(
                md5_int60(F.col("vec_id").cast("string"))
                % F.expr(
                    f"(bc + {KNN_BUCKET_CAP} - 1) div {KNN_BUCKET_CAP}"
                ),
                F.lit(0),
            ).alias("sub"),
        )
        cell = sub.groupBy("pat", "sub").agg(
            F.count(F.lit(1)).alias("c")
        )
        row = cell.agg(
            F.count(F.lit(1)).alias("cells"),
            F.countDistinct("pat").alias("patterns"),
            F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs"),
            F.max("c").alias("max_cell"),
            F.expr("percentile_approx(c, 0.5)").alias("med_cell"),
        ).collect()[0]
        over = bc.filter(F.col("bc") > KNN_BUCKET_CAP).agg(
            F.count(F.lit(1)).alias("over_pats"),
            F.coalesce(F.sum("bc"), F.lit(0)).alias("over_rows"),
            F.coalesce(F.max("bc"), F.lit(0)).alias("max_pat"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n": n,
                    "d": d,
                    "chosen": d == d0,
                    "patterns": row["patterns"],
                    "cells": row["cells"],
                    "pairs": int(row["pairs"]),
                    "pairs_per_vec": round(int(row["pairs"]) / n, 1),
                    "max_cell": row["max_cell"],
                    "med_cell": int(row["med_cell"]),
                    "oversize_patterns": over["over_pats"],
                    "oversize_rows": int(over["over_rows"]),
                    "max_pattern": int(over["max_pat"]),
                }
            ),
            flush=True,
        )
    base.unpersist()


def main() -> None:
    assert_no_spark_jvm()
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("knn-width-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:]:
        probe(spark, sf_dir)


if __name__ == "__main__":
    main()
