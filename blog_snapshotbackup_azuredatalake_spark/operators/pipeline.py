"""End-to-end corpus curation pipeline (SURVEY.md §2C flagship).

``curate_corpus`` chains the individual operators the way a production
training-data job would: quality-filter → near-dup removal (MinHash-LSH
on the survivors) → deterministic train/val/test split → per-(source,
split) stats. Every stage is the already-oracle-checked building block
(text.with_quality_stats, dedup.minhash_pairs, curation's hash split);
this query proves they COMPOSE — the DuckDB oracle recomputes the whole
funnel in one statement from the same CTE builders.

Scale shape: one documents scan feeds the quality filter; the dedup
stage shuffles gram fingerprints of *survivors only*; the split and
final stats are a pure projection plus one small group-by. No stage is
quadratic, no stage moves document text after the first projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.operators.curation import (
    TRAIN_PCT,
    VAL_PCT,
)
from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
    _hash60,
    grams_for,
    minhash_pairs,
    sql_minhash_pair_ctes,
)
from blog_snapshotbackup_azuredatalake_spark.operators.text import (
    sql_quality_ctes,
    with_quality_stats,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

QUALITY_THRESHOLD = 0.43  # ≈ drops the worst decile of the synthetic corpus


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    kept = with_quality_stats(docs).filter(
        F.col("quality_score") >= QUALITY_THRESHOLD
    )
    # near-dup removal among survivors: drop the higher doc_id of each
    # verified pair (canonical = smallest id in a duplicate cluster)
    drops = (
        # the narrow (doc_id, sh) fingerprint frame is consumed by the
        # band index and both verify sides — materialize it once (the
        # wide `kept` frame itself stays lazy: checkpointing text-bearing
        # rows measurably regresses)
        minhash_pairs(grams_for(kept).localCheckpoint(eager=True))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    unique_docs = kept.join(drops, "doc_id", "left_anti")
    slot = _hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(slot < TRAIN_PCT, F.lit("train"))
        .when(slot < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        unique_docs.select(
            "source", split.alias("split"), "n_chars", "quality_score"
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("quality_score").cast("decimal(18,12)"))
            .cast("double")
            .alias("sum_quality"),
        )
    )


_CURATE_SQL = f"""
WITH {sql_quality_ctes("(SELECT doc_id, text, source, n_chars FROM documents)")},
kept AS (
  SELECT * FROM qscored WHERE quality_score >= {QUALITY_THRESHOLD}
),
{sql_minhash_pair_ctes("kept")},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
unique_docs AS (
  SELECT * FROM kept
  WHERE doc_id NOT IN (SELECT doc_id FROM drops)
),
assigned AS (
  SELECT source, n_chars, quality_score,
         CASE
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 < {TRAIN_PCT} THEN 'train'
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM unique_docs
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(quality_score AS DECIMAL(18,12))) AS DOUBLE)
         AS sum_quality
FROM assigned GROUP BY source, split
"""


QUERIES = {"curate_corpus": curate_corpus}
ORACLES = {"curate_corpus": _CURATE_SQL}
