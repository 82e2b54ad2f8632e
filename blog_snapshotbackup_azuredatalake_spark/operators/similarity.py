"""Similarity search over embedding columns (SURVEY.md §2C).

Two plans for top-k cosine neighbors:

- ``ann_topk_bruteforce`` — the exact baseline: query-set × corpus join,
  rank window per query. The query side broadcasts, so the corpus is
  scanned once with no shuffle of the big side; cost is |Q|·|corpus|,
  fine for small query batches at any corpus size.
- ``ann_topk_lsh`` — the scale path: sign-pattern buckets (random-
  hyperplane LSH degenerate form) restrict candidates to the query's
  bucket, making cost Σ bucket² — linear-ish in corpus size. Recall is
  traded for that, as usual with ANN.

Dot products run as zip_with/aggregate double folds inside codegen —
bit-identical to the DuckDB oracle's list_reduce fold (verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
    _dot_cos,
    _sign_bucket,
    _SQL_BUCKET,
    _SQL_COS,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

N_QUERIES = 20
TOP_K = 5
LSH_DIMS = 6


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


_ANN_BRUTE_SQL = f"""
WITH queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
), pairs AS (
  SELECT q_id, b.vec_id AS vec_id, {_SQL_COS.replace("a.embedding", "q_emb").replace("b.embedding", "b.embedding")} AS cos
  FROM queries JOIN embeddings b ON b.vec_id <> q_id
)
SELECT q_id, vec_id, cos, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM pairs)
WHERE rnk <= {TOP_K}
"""


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: candidates limited to the query's sign bucket."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _sign_bucket(F.col("embedding"), LSH_DIMS).alias("bucket"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    pairs = (
        emb.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


_LSH_BUCKET = _SQL_BUCKET.replace(f"[1:{8}]", f"[1:{LSH_DIMS}]")

_ANN_LSH_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding, {_LSH_BUCKET} AS bucket FROM embeddings
), queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM emb
  WHERE vec_id < {N_QUERIES}
), pairs AS (
  SELECT q_id, b.vec_id AS vec_id, {_SQL_COS.replace("a.embedding", "q_emb").replace("b.embedding", "b.embedding")} AS cos
  FROM queries JOIN emb b USING (bucket)
  WHERE b.vec_id <> q_id
)
SELECT q_id, vec_id, cos, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM pairs)
WHERE rnk <= {TOP_K}
"""


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
}

ORACLES = {
    "ann_topk_bruteforce": _ANN_BRUTE_SQL,
    "ann_topk_lsh": _ANN_LSH_SQL,
}
