"""Cold whole-text-suite run at one SF — the same composition
measurement the dedup/graph families have (one fresh session, every
text-analysis entry in registry order, substrate caches empty), so the
per-family SCALING.md evidence covers the text operators too. All text
entries are linear by construction (no pair joins; vocab/grid relations
bounded by vocabulary, not corpus), so the expected alpha is ≤~1.0 per
doubling; anything above flags a hidden quadratic contract, exactly how
the round-5 runs caught dedup_simhash/dedup_embedding.

    SPARK_DRIVER_MEM=48g python scripts/text_suite_scale.py /tmp/sfbig/sf30
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ENTRIES = [
    "text_tokencount",
    "text_quality",
    "text_quality_classifier",
    "text_langid",
    "dq_langid_agreement",
    "text_fingerprint",
    "text_redact_pii",
    "text_vocab_topk",
    "text_oov_rate",
    "text_bm25_search",
    "text_tfidf_keywords",
    "text_ngram_lm",
    "text_perplexity_filter",
    "text_repetition",
    "text_compress_quality",
    "text_gram_novelty",
    "text_boilerplate",
    "text_cooccurrence",
    "text_char_diversity",
    "text_zipf_topmass",
    "text_source_tv_divergence",
]


from _guard import assert_no_spark_jvm  # noqa: E402

def main() -> None:
    assert_no_spark_jvm()
    sf_dir = sys.argv[1]
    import __spark_entry__ as entrymod
    from blog_snapshotbackup_azuredatalake_spark.session import get_session

    spark = get_session("text-suite-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
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
