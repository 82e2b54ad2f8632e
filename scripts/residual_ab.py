"""Round-7 verdict item 2: clean sf60 A/B of the residual-IVFPQ encode.

Question: ann_topk_ivfpq_residual measured ~2x the shared-codebook
ann_topk_ivfpq at sf60 (~120 s true vs 71 s). The barrier hypothesis
was refuted last round (wash); the remaining suspect is the residual
subtract itself — the zip_with + element_at(_cbc, list_id+1) array
construction per row. The docstring's unmeasured fallback inlines the
subtraction into the encode literal (element_at(embedding,i) −
element_at(c_emb,i), no resid array). This measures, min-of-2 warm in
one fresh guarded session:

  A. full-entry cost of ann_topk_ivfpq and ann_topk_ivfpq_residual
     (the 2x claim itself, same conditions)
  B. encode-stage-only cost of the current zip_with-resid form
  C. encode-stage-only cost of the inline-residual form
  D. bit-parity check of B vs C codes (sampled rows)

    SPARK_DRIVER_MEM=48g python scripts/residual_ab.py /tmp/sfbig/sf60de
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from _guard import assert_no_spark_jvm  # noqa: E402


def _inline_encode_sql(cb: dict, ks: list) -> str:
    """_pq_encode_sql with the residual subtraction inlined per
    dimension: x_i = element_at(embedding,i) − element_at(
    element_at(_cbc, list_id+1), i) — no resid array construction."""
    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        _pq_sub,
    )

    def d2_sql(s: int, vals: list) -> str:
        terms = []
        for i, v in enumerate(vals):
            idx = s * PQ_SUBDIM + i + 1
            x = (
                f"(cast(element_at(embedding, {idx}) as double)"
                f" - element_at(element_at(_cbc,"
                f" cast(list_id + 1 as int)), {idx}))"
            )
            c = f"cast('{float(v)!r}' as double)"
            terms.append(f"({x} - {c}) * ({x} - {c})")
        return " + ".join(terms)

    def code_sql(s: int) -> str:
        structs = ", ".join(
            f"named_struct('d2', {d2_sql(s, _pq_sub(cb[k], s))}, 'j', {j})"
            for j, k in enumerate(ks)
        )
        return f"array_min(array({structs})).j"

    return "array(" + ", ".join(code_sql(s) for s in range(PQ_M)) + ")"


def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig/sf60de"

    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.operators import (
        similarity as S,
    )
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("residual-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

    def timed(label, fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            json.dumps(
                {"stage": label, "min_sec": round(best, 2), "sf_dir": sf_dir}
            ),
            flush=True,
        )
        return best

    # A. full entries, same session, same conditions
    timed("full:ann_topk_ivfpq", lambda: qs["ann_topk_ivfpq"](spark, sf_dir))
    timed(
        "full:ann_topk_ivfpq_residual",
        lambda: qs["ann_topk_ivfpq_residual"](spark, sf_dir),
    )

    # shared front half for the encode-stage A/B (mirrors the operator)
    emb = S.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = sorted(
        emb.filter(F.col("vec_id") < S.IVF_NLIST)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
        .collect(),
        key=lambda r: r["centroid_id"],
    )
    cents_lit = S._cents_lit_of(cents)
    cmap = {
        int(c["centroid_id"]): [float(x) for x in c["c_emb"]] for c in cents
    }
    cbyid = F.array(
        *[F.array(*[F.lit(v) for v in cmap[cid]]) for cid in sorted(cmap)]
    )

    def resid_df():
        return (
            emb.withColumn("cents", cents_lit)
            .select(
                "vec_id",
                "embedding",
                F.array_min(S._cent_scored(F.col("embedding")))[
                    "centroid_id"
                ].alias("list_id"),
            )
            .withColumn("_cbc", cbyid)
        )

    # residual seed codebook — identical for both variants
    seed_rows = (
        resid_df()
        .filter(F.col("vec_id") < S.PQ_K)
        .select(
            "vec_id",
            F.zip_with(
                F.col("embedding"),
                F.element_at(
                    F.col("_cbc"), (F.col("list_id") + 1).cast("int")
                ),
                lambda x, y: x.cast("double") - y,
            ).alias("resid"),
        )
        .collect()
    )
    cbr = {
        int(r["vec_id"]): [float(x) for x in r["resid"]] for r in seed_rows
    }
    ksr = sorted(cbr)

    def encode_current():
        return resid_df().select(
            "vec_id",
            "list_id",
            F.zip_with(
                F.col("embedding"),
                F.element_at(
                    F.col("_cbc"), (F.col("list_id") + 1).cast("int")
                ),
                lambda x, y: x.cast("double") - y,
            ).alias("resid"),
        ).select(
            "vec_id",
            "list_id",
            F.expr(S._pq_encode_sql(cbr, ksr, col="resid")).alias("codes"),
        )

    def encode_inline():
        return resid_df().select(
            "vec_id",
            "list_id",
            F.expr(_inline_encode_sql(cbr, ksr)).alias("codes"),
        )

    timed("encode:zipwith_resid", encode_current)
    timed("encode:inline_resid", encode_inline)

    # D. bit-parity of the two encodes on a sample
    a = {
        r["vec_id"]: list(r["codes"])
        for r in encode_current().filter(F.col("vec_id") % 997 == 0).collect()
    }
    b = {
        r["vec_id"]: list(r["codes"])
        for r in encode_inline().filter(F.col("vec_id") % 997 == 0).collect()
    }
    same = a == b
    print(
        json.dumps({"parity_rows": len(a), "identical": same}), flush=True
    )
    if not same:
        raise SystemExit("encode variants disagree — inline form is WRONG")


if __name__ == "__main__":
    main()
