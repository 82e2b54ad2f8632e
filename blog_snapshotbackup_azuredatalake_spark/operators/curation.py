"""Corpus-curation operators for training-data pipelines (SURVEY.md §2C).

Three pipeline staples beyond dedup/similarity/text-analysis:

- ``corpus_split`` — deterministic hash-based train/val/test assignment
  with per-(source, split) stats. Hash-of-key splitting (not random) is
  what a reproducible 100 TB pipeline needs: stable under reruns,
  re-partitioning, and incremental appends.
- ``doc_chunk`` — fixed-size token chunking with overlap (the context-
  window packing step before tokenization), emitted as one row per chunk
  with its own content hash for downstream chunk-level dedup.
- ``emb_centroid_assign`` — nearest-centroid assignment of every
  embedding against a fixed centroid set (one Lloyd/k-means assignment
  step, the building block of clustering-based data curation). The
  centroid set broadcasts; the corpus side never shuffles.

All three are single-pass, shuffle only for their final group-by stats,
and mirror bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.operators.dedup import _hash60
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

N_CENTROIDS = 8


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to train/val/test by md5(doc_id) mod 100 and
    report per-(source, split) document/char counts. The split column is
    a pure function of the stable key — adding documents later never
    reshuffles existing assignments."""
    docs = load_table(spark, sf_dir, "documents")
    slot = _hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(slot < TRAIN_PCT, F.lit("train"))
        .when(slot < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_CORPUS_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 < {TRAIN_PCT} THEN 'train'
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM assigned GROUP BY source, split
"""


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into {CHUNK_TOKENS}-token chunks with
    {CHUNK_OVERLAP}-token overlap; one output row per chunk with token
    count and chunk md5. Token array is bound as a column before the
    chunk lambda slices it (SURVEY.md §6 inlining trap), and the chunk
    array explodes with explode_outer to dodge the inferred-filter
    trap."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - CHUNK_OVERLAP) / CHUNK_STRIDE).cast("int"), F.lit(1)
    )
    chunk_text = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i * CHUNK_STRIDE + 1, CHUNK_TOKENS), " "
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"), chunk_text(i).alias("chunk")
        ),
    )
    return (
        toked.select(
            "doc_id", F.explode_outer(chunks).alias("c")
        )
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size(F.split(F.col("c.chunk"), " ")).cast("bigint").alias(
                "chunk_tokens"
            ),
            F.md5(F.col("c.chunk")).alias("chunk_md5"),
        )
    )


_DOC_CHUNK_SQL = f"""
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), spans AS (
  SELECT doc_id, toks,
         range(0, greatest(CAST(ceil((len(toks) - {CHUNK_OVERLAP})
              / {CHUNK_STRIDE}.0) AS INT), 1)) AS ids
  FROM toked
), ids AS (
  SELECT doc_id, toks, unnest(ids) AS chunk_id FROM spans
), exploded AS (
  SELECT doc_id, chunk_id,
         array_to_string(list_slice(toks,
             chunk_id * {CHUNK_STRIDE} + 1,
             chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ') AS chunk
  FROM ids
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
       md5(chunk) AS chunk_md5
FROM exploded
"""


def emb_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment: centroids are the embeddings of
    vec_id < N_CENTROIDS (a deterministic seed set — in a real pipeline,
    the previous Lloyd iteration's output). Centroids broadcast; the
    corpus scans once with no shuffle until the final stats group-by."""
    from blog_snapshotbackup_azuredatalake_spark.operators.dedup import _dot_cos

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    scored = (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "label",
            "centroid_id",
            _dot_cos(F.col("embedding"), F.col("c_emb")).alias("cos"),
        )
    )
    best = scored.groupBy("vec_id", "label").agg(
        F.max_by("centroid_id", F.struct(F.col("cos"), -F.col("centroid_id")))
        .alias("centroid_id"),
        F.max("cos").alias("best_cos"),
    )
    return best.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        # decimal pre-agg: double SUM is association-order-dependent and
        # the engines fold in different orders (SURVEY.md §4)
        F.sum(F.col("best_cos").cast("decimal(18,12)"))
        .cast("double")
        .alias("sum_cos"),
        F.count_distinct("label").alias("n_labels"),
    )


_EMB_CENTROID_SQL = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {N_CENTROIDS}
), scored AS (
  SELECT e.vec_id, e.label, c.centroid_id,
         {{cos}} AS cos
  FROM embeddings e CROSS JOIN centroids c
), best AS (
  SELECT vec_id, label, centroid_id, cos AS best_cos
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, label
                                     ORDER BY cos DESC, centroid_id) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT centroid_id, COUNT(*) AS n_members,
       CAST(SUM(CAST(best_cos AS DECIMAL(18,12))) AS DOUBLE) AS sum_cos,
       COUNT(DISTINCT label) AS n_labels
FROM best GROUP BY centroid_id
""".format(
    cos="""(
  list_reduce(list_transform(range(1, 1 + len(e.embedding)),
    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)),
    (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(e.embedding,
       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(c.c_emb,
       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))
)"""
)


BENCH_MOD = 13  # doc_id % 13 == 0 plays the held-out benchmark set


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share ANY
    token-5-gram fingerprint with the held-out set (doc_id % 13 == 0
    stands in for the eval benchmark). The benchmark's distinct shingle
    set is small at any corpus size — it broadcasts into a semi-join
    against the exploded train shingles, so the train corpus never
    shuffles for the overlap test; only the final per-source stats
    group-by does. Reports contamination counts per source."""
    from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
        grams_for,
    )

    docs = load_table(spark, sf_dir, "documents")
    grams = grams_for(docs)  # (doc_id, sh: array<bigint>)
    bench_g = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    train_g = (
        grams.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    contaminated = (
        train_g.join(F.broadcast(bench_g), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )
    return (
        docs.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", "source")
        .join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_cont").alias("n_contaminated"),
        )
    )


_DECONTAMINATE_SQL = f"""
WITH toked AS (
  SELECT doc_id, {{tokh}} AS th FROM documents
), grams AS (
  SELECT doc_id, {{gramh}} AS sh FROM toked
), bench AS (
  SELECT DISTINCT unnest(sh) AS g FROM grams WHERE doc_id % {BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(sh) AS g FROM grams
        WHERE doc_id % {BENCH_MOD} <> 0)
  WHERE g IN (SELECT g FROM bench)
)
SELECT source, COUNT(*) AS n_docs,
       COUNT(CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
             THEN 1 END) AS n_contaminated
FROM documents
WHERE doc_id % {BENCH_MOD} <> 0
GROUP BY source
"""

from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (  # noqa: E402
    _SQL_GRAM_HASHES,
    _SQL_TOKH,
)

_DECONTAMINATE_SQL = _DECONTAMINATE_SQL.format(
    tokh=_SQL_TOKH, gramh=_SQL_GRAM_HASHES
)


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: each source gets its own
    keep-rate (a stable function of the source name), each document
    keeps or drops by md5(doc_id) mod 100 — reproducible under reruns,
    appends, and re-partitioning, unlike rand()-based sampling. Returns
    per-source totals, kept counts, and the applied rate."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (_hash60(F.col("source")) % 60 + 20).cast("int")  # 20..79 pct
    slot = _hash60(F.col("doc_id").cast("string")) % 100
    return (
        docs.select(
            "source",
            rate.alias("rate_pct"),
            (slot < rate).cast("int").alias("kept"),
        )
        .groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
        )
    )


_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

_SAMPLE_STRATIFIED_SQL = f"""
SELECT source,
       CAST({_H60.format(x="source")} % 60 + 20 AS INT) AS rate_pct,
       COUNT(*) AS n_docs,
       SUM(CASE WHEN {_H60.format(x="CAST(doc_id AS VARCHAR)")} % 100
                     < {_H60.format(x="source")} % 60 + 20
                THEN 1 ELSE 0 END) AS n_kept
FROM documents
GROUP BY source
"""


QUERIES = {
    "corpus_split": corpus_split,
    "doc_chunk": doc_chunk,
    "emb_centroid_assign": emb_centroid_assign,
    "corpus_decontaminate": corpus_decontaminate,
    "corpus_sample_stratified": corpus_sample_stratified,
}

ORACLES = {
    "corpus_split": _CORPUS_SPLIT_SQL,
    "doc_chunk": _DOC_CHUNK_SQL,
    "emb_centroid_assign": _EMB_CENTROID_SQL,
    "corpus_decontaminate": _DECONTAMINATE_SQL,
    "corpus_sample_stratified": _SAMPLE_STRATIFIED_SQL,
}
