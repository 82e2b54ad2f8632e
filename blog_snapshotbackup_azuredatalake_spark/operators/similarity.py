"""Similarity search over embedding columns (SURVEY.md §2C).

Three plans for top-k cosine neighbors:

- ``ann_topk_bruteforce`` — the exact baseline: query-set × corpus join,
  rank window per query. The query side broadcasts, so the corpus is
  scanned once with no shuffle of the big side; cost is |Q|·|corpus|,
  fine for small query batches at any corpus size.
- ``ann_topk_lsh`` — sign-pattern buckets (random-hyperplane LSH
  degenerate form) restrict candidates to the query's bucket, making
  cost Σ bucket² — linear-ish in corpus size. Recall is traded for
  that, as usual with ANN.
- ``ann_topk_ivf`` — IVF coarse+fine: assign every corpus vector to its
  nearest of NLIST coarse centroids (one broadcast join + map-side
  min_by, no corpus shuffle), then each query probes its NPROBE nearest
  lists and re-ranks exactly within them. Candidate cost is
  |Q|·NPROBE/NLIST of the corpus — the standard inverted-file ANN
  trade, and unlike the sign-LSH it degrades gracefully (more probes →
  more recall) without re-bucketing.

Dot products run as zip_with/aggregate double folds — bit-identical to
the DuckDB oracle's list_reduce fold (verified). These higher-order
functions are CodegenFallback (interpreted), which is why every pair
scorer hoists row-constant norms out of the per-pair expression
(`_dot_cos_pre`, round 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.operators.dedup import (
    _dot_cos,
    _dot_cos_pre,
    _norm,
    _sign_bucket,
    _sql_cos,
    _SQL_BUCKET,
    _SQL_COS,
)
from blog_snapshotbackup_azuredatalake_spark.functions.skew import (
    two_phase_rank_dual,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

N_QUERIES = 20
TOP_K = 5
LSH_DIMS = 6
IVF_NLIST = 16
IVF_NPROBE = 4

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_FP = 1 << 20
HYBRID_QUERY_ID = 0  # pinned demo query: doc/vec 0's text terms + vector
HYBRID_TOPK = 10


def ann_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — BM25 lexical ranks fused with vector-cosine
    ranks by Reciprocal Rank Fusion (Cormack et al.: score =
    Σ 1/(k+rank), k={RRF_K}), the standard two-tower search recipe
    (lexical catches exact terms, vectors catch paraphrase; RRF needs
    no score calibration because it only consumes RANKS). Both lists
    are the already-oracle-checked building blocks: `text_bm25_search`
    (one corpus scan + one-row stats broadcast) and the pinned query's
    IVF probe/re-rank shortlist (`ann_topk_ivf`'s plan shape — the
    100 TB path: map-only coarse assign, probe {IVF_NPROBE} lists,
    exact cosine only inside them; RRF consumes RANKS, so swapping the
    shortlist never changes the fusion arithmetic).
    Fusion arithmetic is integer fixed point ({RRF_FP} div (k+rank)),
    so the certificate hashes bit-identically; the full-outer join of
    two ≤{BM25_TOPK}-row lists is driver-trivial at any corpus size."""
    from blog_snapshotbackup_azuredatalake_spark.operators.text import (
        text_bm25_search,
    )

    lex = text_bm25_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    # the vector list IS the IVF shortlist (the shipped 100 TB path —
    # ann_topk_ivf's probe/re-rank, restricted to the pinned query):
    # coarse assign is map-only against the literal centroid set, the
    # query probes its IVF_NPROBE nearest lists, exact re-rank runs
    # inside the probed lists only. No corpus-wide crossJoin anywhere
    # in this entry; the brute-force scorer stays in
    # ann_topk_bruteforce as the labeled baseline.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    centroids = emb.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cents_lit = _cents_lit_of(cents)
    assigned = (
        emb.withColumn("cents", cents_lit)
        .select(
            "vec_id",
            "embedding",
            F.array_min(_cent_scored(F.col("embedding"))).alias("best"),
        )
        .select(
            "vec_id",
            F.col("best.centroid_id").alias("list_id"),
            "embedding",
        )
    )
    # PARTIAL norm hoist (round 10): q_nrm was re-folded per matched
    # corpus row; it now rides the tiny probe side. The corpus norm
    # stays inline — ONE query probes IVF_NPROBE/IVF_NLIST lists, so
    # most corpus rows never match and a corpus-side norm column would
    # cost more rows than it saves (the ann_topk_lsh selective-join
    # argument).
    probes = (
        emb.filter(F.col("vec_id") == HYBRID_QUERY_ID)
        .withColumn("cents", cents_lit)
        .select(
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
            F.explode(
                F.slice(
                    F.array_sort(_cent_scored(F.col("embedding"))),
                    1,
                    IVF_NPROBE,
                )
            ).alias("pr"),
        )
        .select("q_emb", "q_nrm", F.col("pr.centroid_id").alias("list_id"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != HYBRID_QUERY_ID)
        .select(
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                _norm(F.col("embedding")),
            ).alias("cos"),
        )
    )
    wv = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    from blog_snapshotbackup_azuredatalake_spark.operators.text import (
        BM25_TOPK,
    )

    # round 10: single global window kept — Spark 4.1 plans this
    # rank+filter shape as TakeOrderedAndProject (map-side local top-k,
    # merge of |tasks|·k rows), NOT a single-partition sort
    vec = (
        scored.withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= BM25_TOPK)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.col("lex_rank").cast("int").alias("lex_rank"),
        "vec_rank",
        (
            F.coalesce(
                F.expr(f"{RRF_FP} div ({RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_FP} div ({RRF_K} + vec_rank)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_fp"),
    )
    wf = Window.orderBy(F.desc("rrf_fp"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= HYBRID_TOPK)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "lex_rank",
            "vec_rank",
            "rrf_fp",
        )
    )


def _hybrid_rrf_sql() -> str:
    from blog_snapshotbackup_azuredatalake_spark.operators.text import (
        BM25_TOPK,
        _bm25_sql,
    )

    cos = _SQL_COS.replace("a.embedding", "q_emb")
    # the vec list mirrors the Spark side's IVF shortlist: coarse
    # assign ≡ row_number over (l2², centroid_id), probe the query's
    # IVF_NPROBE nearest lists, exact cosine re-rank inside them
    return f"""
WITH lex AS ({_bm25_sql()}),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, embedding, centroid_id AS list_id
  FROM (SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), probes AS (
  SELECT q_emb, list_id
  FROM (SELECT q.embedding AS q_emb, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id = {HYBRID_QUERY_ID})
  WHERE pr <= {IVF_NPROBE}
), pairs AS (SELECT b.vec_id AS doc_id, {cos} AS cos
             FROM probes JOIN assigned b USING (list_id)
             WHERE b.vec_id <> {HYBRID_QUERY_ID}),
vec AS (SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT)
                 AS vec_rank
        FROM pairs QUALIFY vec_rank <= {BM25_TOPK}),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         CAST(lex.rank AS INT) AS lex_rank, vec.vec_rank,
         CAST(COALESCE({RRF_FP} // ({RRF_K} + lex.rank), 0)
              + COALESCE({RRF_FP} // ({RRF_K} + vec.vec_rank), 0)
              AS BIGINT) AS rrf_fp
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id) AS INT)
         AS rank,
       doc_id, lex_rank, vec_rank, rrf_fp
FROM fused QUALIFY rank <= {HYBRID_TOPK}
"""


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors.
    Norms are hoisted to per-row columns on both sides of the pair
    join (round 10, `_dot_cos_pre`): same folds, same quotient —
    bit-identical — but evaluated once per row instead of once per
    pair (sf60de 3.71 → 2.29 s, warm spread collapsed)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    # round 10: left as a single window — Spark 4.1 plans this
    # rank+filter shape with WindowGroupLimit(Partial) before the
    # exchange (map-side top-k per query), so the sort parallelism is
    # NOT bounded by |Q|; see _adc_shortlist's docstring
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
    """ANN top-k via MULTI-PROBE sign-bucket LSH: each query probes its
    own bucket plus the LSH_DIMS Hamming-1 neighbors (a near neighbor
    that disagrees on one hyperplane sign lands one flip away —
    single-bucket probing measured only 0.03–0.08 recall@5, multi-probe
    recovers most of it for a 7× blowup of the TINY query side only;
    the corpus is still touched once per matching bucket)."""
    # PARTIAL norm hoist (round 10): only the broadcast query side's
    # norm is precomputed. The bucket join is SELECTIVE — most corpus
    # rows match no probe bucket — so a corpus-side norm column would
    # fold once per corpus ROW while saving only per matched PAIR: the
    # full hoist measured a regression here (sf60de 1.44 → 2.00 s min)
    # where its crossJoin siblings gained 1.5–3.5×. The corpus norm
    # stays inline (evaluated on matched pairs only); q_nrm rides the
    # tiny probe side for free.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _sign_bucket(F.col("embedding"), LSH_DIMS).alias("bucket"),
    )
    base_q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    flip = F.expr(
        "CASE WHEN i = 0 THEN bucket ELSE concat(substring(bucket, 1, i - 1),"
        " CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END,"
        f" substring(bucket, i + 1, {LSH_DIMS})) END"
    )
    queries = (
        base_q.select(
            "q_id",
            "q_emb",
            "q_nrm",
            "bucket",
            F.explode_outer(F.sequence(F.lit(0), F.lit(LSH_DIMS))).alias("i"),
        )
        .select("q_id", "q_emb", "q_nrm", flip.alias("bucket"))
    )
    pairs = (
        emb.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                _norm(F.col("embedding")),
            ).alias("cos"),
        )
        # round 10: the `.distinct()` here was a NO-OP paying a full
        # corpus-sized Exchange + hash aggregate (guide §2.4: distinct
        # on data that is already unique). A (q_id, vec_id) pair can
        # never repeat: a corpus vector has exactly ONE bucket string,
        # and a query's 1 + LSH_DIMS probe buckets are pairwise
        # DISTINCT (each flip toggles a different character), so at
        # most one probe row of a query joins any vector
        # (tests/test_lsh_probe_uniqueness.py pins the invariant; the
        # oracle keeps its DISTINCT — identity on dup-free input).
    )
    # round 10: left as a single window — Spark 4.1 plans this
    # rank+filter shape with WindowGroupLimit(Partial) before the
    # exchange (map-side top-k per query), so the sort parallelism is
    # NOT bounded by |Q|; see _adc_shortlist's docstring
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
), base_q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM emb
  WHERE vec_id < {N_QUERIES}
), queries AS (
  -- multi-probe: own bucket + all {LSH_DIMS} Hamming-1 neighbors
  SELECT q_id, q_emb,
         CASE WHEN i = 0 THEN bucket
              ELSE substr(bucket, 1, CAST(i - 1 AS INT))
                   || (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
                            THEN '0' ELSE '1' END)
                   || substr(bucket, CAST(i + 1 AS INT), {LSH_DIMS})
         END AS bucket
  FROM base_q, range(0, {LSH_DIMS + 1}) t(i)
), pairs AS (
  SELECT DISTINCT q_id, b.vec_id AS vec_id, {_SQL_COS.replace("a.embedding", "q_emb").replace("b.embedding", "b.embedding")} AS cos
  FROM queries JOIN emb b USING (bucket)
  WHERE b.vec_id <> q_id
)
SELECT q_id, vec_id, cos, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM pairs)
WHERE rnk <= {TOP_K}
"""


def _l2sq(a, b):
    """Σ (aᵢ-bᵢ)² as a double fold — same association order as the
    oracle's list_reduce, so assignments are bit-identical."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: NLIST deterministic coarse centroids (the first NLIST
    corpus vectors), corpus assigned to its nearest list via a broadcast
    join + map-side min_by (the corpus never shuffles), queries probe
    their IVF_NPROBE nearest lists and re-rank exactly inside them."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    return _ivf_search(emb, centroids)


def _cents_lit_of(cents: list) -> F.Column:
    """nlist×d centroid rows (sorted by centroid_id) → ONE literal
    array<struct<centroid_id, c_emb>> column — constant-folded once,
    referenced by name (inlining the 1k-node literal tree into every
    consumer measurably bloats planning/eval)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(c["centroid_id"]))
                .cast("bigint")
                .alias("centroid_id"),
                F.array(*[F.lit(float(v)) for v in c["c_emb"]]).alias(
                    "c_emb"
                ),
            )
            for c in cents
        ]
    )


def _cent_scored(emb_col: F.Column) -> F.Column:
    """Per-centroid (d2, centroid_id) structs against the `cents`
    literal column; struct min/sort ≡ ORDER BY d2, centroid_id."""
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _l2sq(emb_col, c["c_emb"]).alias("d2"),
            c["centroid_id"].alias("centroid_id"),
        ),
    )


def _ivf_search(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Probe-and-rerank against any (centroid_id, c_emb) coarse list
    set; the IVF plan shape is independent of how the lists were
    built."""
    # coarse assignment is MAP-ONLY: the nlist×d centroid set is tiny
    # and driver-known, so it becomes a literal struct array and each
    # corpus row takes argmin in place (struct min ≡ min over
    # (d2, centroid_id), matching the oracle's row_number order). The
    # crossJoin+groupBy shape would re-shuffle the corpus by vec_id —
    # the corpus now reaches the bucket join with NO exchange at all.
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cents_lit = _cents_lit_of(cents)
    scored = _cent_scored

    assigned = (
        emb.withColumn("cents", cents_lit)
        .select(
            "vec_id",
            "embedding",
            F.array_min(scored(F.col("embedding"))).alias("best"),
            # per-row norm hoisted below the probe join (round 10,
            # `_dot_cos_pre`): folded once per row, not once per pair
            _norm(F.col("embedding")).alias("nrm"),
        )
        .select(
            "vec_id",
            F.col("best.centroid_id").alias("list_id"),
            "embedding",
            "nrm",
        )
    )
    # probe selection is map-only too: sort the same struct array
    # (lexicographic ≡ ORDER BY d2, centroid_id) and explode the first
    # nprobe entries — no crossJoin, no window
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    probes = (
        queries.withColumn("cents", cents_lit)
        .select(
            "q_id",
            "q_emb",
            "q_nrm",
            F.explode(
                F.slice(F.array_sort(scored(F.col("q_emb"))), 1, IVF_NPROBE)
            ).alias("pr"),
        )
        .select(
            "q_id", "q_emb", "q_nrm", F.col("pr.centroid_id").alias("list_id")
        )
    )
    pairs = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    # round 10: left as a single window — Spark 4.1 plans this
    # rank+filter shape with WindowGroupLimit(Partial) before the
    # exchange (map-side top-k per query), so the sort parallelism is
    # NOT bounded by |Q|; see _adc_shortlist's docstring
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


_SQL_L2SQ = """list_reduce(list_transform(range(1, 1 + len({a})),
  i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
     * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))),
  (x, y) -> x + y)"""

_ANN_IVF_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  -- row_number over (d2, centroid_id) ≡ Spark's min_by(cid, struct(d2, cid))
  SELECT vec_id, embedding, centroid_id AS list_id
  FROM (SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), probes AS (
  SELECT q_id, q_emb, list_id
  FROM (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
               c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < {N_QUERIES})
  WHERE pr <= {IVF_NPROBE}
), pairs AS (
  SELECT q_id, b.vec_id AS vec_id,
         {_SQL_COS.replace("a.embedding", "q_emb").replace("b.embedding", "b.embedding")} AS cos
  FROM probes JOIN assigned b USING (list_id)
  WHERE b.vec_id <> q_id
)
SELECT q_id, vec_id, cos, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM pairs)
WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# filtered ANN (metadata predicate + IVF probe)
# ---------------------------------------------------------------------------

FILTER_LABEL = 3  # the demo predicate: ~1/10 of the corpus qualifies
FILTER_NPROBE = 8  # 2× the unfiltered nprobe: post-filtering thins each
# probed list by the predicate's selectivity, so probing more lists is
# how filtered search recovers candidate count (the standard trade)


def ann_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN — top-k under a metadata predicate (`label = 3`),
    the retrieval shape every real vector deployment needs (search
    within a language / license / source slice): the IVF index is
    built ONCE on the FULL corpus (indexes are not rebuilt per
    predicate), the predicate is applied to candidates INSIDE the
    probed lists (post-filtering), and {FILTER_NPROBE} lists are probed
    — double the unfiltered {IVF_NPROBE} — to recover the candidate
    mass the filter removes. Same map-only coarse-assign as
    `ann_topk_ivf` (literal centroid array, corpus never shuffles
    before the bucket join); the predicate reaches the scan as a
    pushable filter on the probe side."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("int").alias("label")
    )
    centroids = emb.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cents_lit = F.array(
        *[
            F.struct(
                F.lit(int(c["centroid_id"]))
                .cast("bigint")
                .alias("centroid_id"),
                F.array(*[F.lit(float(v)) for v in c["c_emb"]]).alias(
                    "c_emb"
                ),
            )
            for c in cents
        ]
    )

    def scored(emb_col):
        return F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _l2sq(emb_col, c["c_emb"]).alias("d2"),
                c["centroid_id"].alias("centroid_id"),
            ),
        )

    assigned = (
        emb.withColumn("cents", cents_lit)
        .select(
            "vec_id",
            "embedding",
            "label",
            F.array_min(scored(F.col("embedding"))).alias("best"),
            # per-row norm hoisted below the probe join (round 10,
            # `_dot_cos_pre`): folded once per row, not once per pair
            _norm(F.col("embedding")).alias("nrm"),
        )
        .select(
            "vec_id",
            "embedding",
            "label",
            F.col("best.centroid_id").alias("list_id"),
            "nrm",
        )
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    probes = (
        queries.withColumn("cents", cents_lit)
        .select(
            "q_id",
            "q_emb",
            "q_nrm",
            F.explode(
                F.slice(
                    F.array_sort(scored(F.col("q_emb"))), 1, FILTER_NPROBE
                )
            ).alias("pr"),
        )
        .select(
            "q_id", "q_emb", "q_nrm", F.col("pr.centroid_id").alias("list_id")
        )
    )
    pairs = (
        assigned.filter(F.col("label") == FILTER_LABEL)
        .join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    # round 10: single window kept — WindowGroupLimit(Partial) already
    # does the map-side top-k here; see _adc_shortlist's docstring
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "q_id",
            "vec_id",
            "label",
            "cos",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_ANN_FILTERED_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, embedding, label, centroid_id AS list_id
  FROM (SELECT e.vec_id, e.embedding, CAST(e.label AS INT) AS label,
               c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), probes AS (
  SELECT q_id, q_emb, list_id
  FROM (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
               c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < {N_QUERIES})
  WHERE pr <= {FILTER_NPROBE}
), pairs AS (
  SELECT q_id, b.vec_id AS vec_id, b.label AS label,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cos
  FROM probes JOIN assigned b USING (list_id)
  WHERE b.vec_id <> q_id AND b.label = {FILTER_LABEL}
)
SELECT q_id, vec_id, label, cos, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM pairs)
WHERE rnk <= {TOP_K}
"""


IVF_TRAIN_ITERS = 2


def ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED coarse lists: {IVF_TRAIN_ITERS} Lloyd iterations
    (reusing clustering's assign/recompute stages, k = IVF_NLIST) move
    the centroids onto the data manifold before the same probe-and-
    rerank as ``ann_topk_ivf`` — the standard faiss-style recipe, here
    as a composition of two existing operators. Training cost is
    {IVF_TRAIN_ITERS} corpus scans with k×d-cell shuffles; only the
    k×d centroid matrix ever reaches the driver. Rows-only entry: the
    iterative training isn't one SQL statement (recall measured in
    scripts/ann_quality.py — 0.93 vs 0.89 untrained at sf0.1; at tiny
    SFs training is a wash because every list is near-empty)."""
    from blog_snapshotbackup_azuredatalake_spark.operators.clustering import (
        _assign,
        _recompute,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # faiss-style: train the coarse quantizer on a deterministic sample
    # sized to the centroid count (~64 points per list), not the corpus —
    # at 100 TB the Lloyd loop touches a cacheable sliver while only the
    # single final assignment scans everything. Below the target size the
    # modulus degenerates to 1 (train on all; sampling 200 vectors onto
    # 16 lists measurably hurts recall). Checkpointed so iterations
    # don't re-read parquet.
    modulus = max(1, emb.count() // (64 * IVF_NLIST))
    train = emb.filter(F.col("vec_id") % modulus == 0).localCheckpoint(
        eager=True
    )
    centroids = emb.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "c_emb"
        ),
    )
    for _ in range(IVF_TRAIN_ITERS):
        centroids = _recompute(spark, _assign(train, centroids))
    return _ivf_search(emb, centroids)


def ann_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput variant of ``ann_topk_bruteforce``: one numpy matmul
    per Arrow batch scores every query against the batch (the ~3×
    measured win from scripts/udf_bench.py), each batch emits only its
    per-query top-k (bounded output: |Q|·k rows per batch, not |B|·|Q|),
    and a final window takes the global top-k. The query matrix is tiny
    by definition, so it rides into the closure like a broadcast var.
    Rows-only entry: numpy's pairwise summation is not bit-identical to
    the SQL fold, so near-tied ranks may differ in the last ulp — the
    test asserts ≥95% pair overlap with the exact baseline instead."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()  # small by design
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    k = TOP_K

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            arr = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            arr /= np.linalg.norm(arr, axis=1, keepdims=True)
            cos = arr @ q_mat.T  # B × |Q|
            parts = []
            for j in range(len(q_ids)):
                col = cos[:, j]
                cand = np.nonzero(ids != q_ids[j])[0]
                take = cand[np.argsort(-col[cand], kind="stable")[: k]]
                parts.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(len(take), q_ids[j]),
                            "vec_id": ids[take],
                            "cos": col[take],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    scored = emb.mapInPandas(score, "q_id long, vec_id long, cos double")
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


KNN_GRAPH_K = 3
KNN_GRAPH_DIMS = 6  # minimum sign dims (64 buckets)
KNN_TARGET_BUCKET = 256  # target vectors per bucket at scale


def _knn_graph_dims(n: int) -> int:
    """Scale-adaptive sign-LSH width: enough bucket bits that the
    expected bucket holds ~{KNN_TARGET_BUCKET} vectors, never fewer
    than {KNN_GRAPH_DIMS}. Fixed bucket count means Σ bucket² ∝ n²;
    constant expected occupancy makes the candidate join ∝ n — the
    documented log(n)-bucket escalation, as code. The oracle computes
    the identical formula in SQL (exact for the clamped range at gate
    SFs; log2 of a power of two is exact in both engines)."""
    import math

    return max(
        KNN_GRAPH_DIMS, math.ceil(math.log2(max(n, 1) / KNN_TARGET_BUCKET))
    )


KNN_BUCKET_CAP = 512  # hard per-bucket occupancy cap (2× the target)


def _knn_subsplits(bucket_count: int) -> int:
    """Sub-buckets an oversize pattern bucket splits into —
    ceil(count/cap) by integer arithmetic, exact in Python, Spark
    (`div`), and DuckDB (`//`) alike (parity property-tested)."""
    return (bucket_count + KNN_BUCKET_CAP - 1) // KNN_BUCKET_CAP


def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus k-NN GRAPH construction (every vector's top-{KNN_GRAPH_K}
    in-corpus neighbors) — the substrate for graph-based curation:
    near-dup clustering seeds, label propagation, diversity sampling.

    Unlike the query-set ANN ops, BOTH sides are the whole corpus, so
    blocking is what makes it feasible: a sign-pattern LSH self-join
    with a HARD per-bucket occupancy cap. Adaptive pattern width
    (``_knn_graph_dims``) keeps expected occupancy near the target,
    and any bucket that still exceeds {KNN_BUCKET_CAP} vectors —
    skewed sign patterns: mega-groups of near-identical vectors, where
    measurement (sf10→sf30, SCALING.md) showed the pattern space
    SATURATES so no amount of extra bits splits them — is sub-split by
    md5(vec_id) mod ceil(count/{KNN_BUCKET_CAP}). That bounds
    candidate pairs to ≤ n·{KNN_BUCKET_CAP} AT ANY n by construction,
    trading only recall WITHIN capped mega-buckets, whose members are
    near-interchangeable as neighbors. Round-8 instrumentation
    (scripts/knn_width_probe.py, SCALING.md) measured the bound live:
    at 600 k→1.2 M vectors the pattern space saturates at ~1.6–1.8 k
    patterns, EVERY pattern is oversize at 1.2 M, and candidate pairs
    grow 186.6 M→389.6 M — 2.09× for 2× n, pair-alpha 1.06. (The
    round-7 "trigger the width step earlier" idea is REFUTED by the
    same probe: one extra pattern bit removes only ~4% of pairs,
    because the saturated mega-patterns, not expected occupancy, carry
    the mass.)

    The pair stage is VECTORIZED per cell (round 8): the capped cells
    make every group <= {KNN_BUCKET_CAP} vectors, so the all-pairs
    cosine + top-k inside a cell is a bounded dense-matrix problem --
    groupBy(pat, sub).applyInPandas computes it with numpy instead of
    expanding a candidate-pair RELATION. The round-8 stage probe
    (SCALING.md) showed the old self-join's per-pair interpreted
    higher-order-function cosine was ~80% of the build (72 s of 94
    warm at 600 k vectors) and the 390 M-row pair sort the rest; both
    hypothesized micro-fixes (per-row norm precompute, in-cell rank
    window) measured a WASH because expression evaluation over the
    pair relation itself was the floor. The UDF path never
    materializes pairs engine-side: ONE corpus shuffle by (pat, sub)
    -- explicitly repartitioned proportional to n so AQE's
    map-size-based coalescing (blind to the ~325x in-cell pair
    expansion) can't serialize the compute onto a handful of tasks --
    then per-cell O(m^2 d) float64 arithmetic at numpy speed, emitting
    only the {KNN_GRAPH_K} kept edges per vector.

    ORACLE PARITY IS BIT-EXACT BY FOLD ORDER: the kernel accumulates
    dot products and squared norms dimension-at-a-time (G += x_i*y_i,
    s += x_i^2) -- the same left-to-right double fold as F.aggregate
    and DuckDB's list_reduce -- then cos = dot/(|x|*|y|) with the
    identical multiply-then-divide; verified value-hash-equal against
    the unchanged SQL oracle at sf0.001/sf0.01/sf1. Ties break by
    neighbor id; NaN cosines (zero-norm vectors) sort FIRST on the
    descending key, matching Spark/DuckDB double ordering.

    Recall follows the LSH trade (same-bucket neighbors only; more
    bits = finer buckets = lower recall per bucket) -- the recall
    escalation is multi-probe or IVF blocking, both shipped for the
    query-set case."""
    import math

    from blog_snapshotbackup_azuredatalake_spark.functions.hashing import (
        md5_int60,
    )
    from blog_snapshotbackup_azuredatalake_spark.functions.hints import (
        broadcast_if_bounded,
    )
    from blog_snapshotbackup_azuredatalake_spark.session import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    base = load_table(spark, sf_dir, "embeddings")
    n = base.count()
    dims = _knn_graph_dims(n)
    patted = base.select(
        "vec_id",
        "embedding",
        _sign_bucket(F.col("embedding"), dims).alias("pat"),
    )
    # Oversize-pattern counts via groupBy (map-side combine -- skew-safe:
    # a 10M-row mega-bucket partial-aggregates to one cell per map task,
    # no hot partition) instead of a window by `pat`, which would shuffle
    # AND sort the full embedding payload with every mega-bucket pinned
    # to one task. Only patterns PAST the cap survive the filter -- the
    # skew set, small by nature (<= n/cap worst case) -- and ride a
    # GUARDED broadcast back; everything else defaults to sub 0. The
    # corpus payload therefore shuffles exactly once: by (pat, sub) for
    # the per-cell kernel.
    oversize = (
        patted.groupBy("pat")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") > KNN_BUCKET_CAP)
    )
    emb = (
        patted.join(broadcast_if_bounded(oversize), "pat", "left")
        .select(
            "vec_id",
            "embedding",
            "pat",
            F.coalesce(
                md5_int60(F.col("vec_id").cast("string"))
                % F.expr(f"(bc + {KNN_BUCKET_CAP} - 1) div {KNN_BUCKET_CAP}"),
                F.lit(0),
            ).alias("sub"),
        )
    )
    # explicit partition count proportional to n: the corpus shuffle is
    # ~230 B/row, so AQE would coalesce it to a handful of
    # map-size-right tasks -- each then owning MILLIONS of in-cell
    # pairs (the same estimate-blind class as the explode-broadcast
    # lint). ~20 k rows per task bounds per-task pair work at
    # ~20 k * CAP.
    nparts = max(
        spark.sparkContext.defaultParallelism, math.ceil(n / 20_000)
    )
    return (
        emb.repartition(nparts, "pat", "sub")
        .groupBy("pat", "sub")
        .applyInPandas(
            _knn_cell_topk, "src bigint, rank int, dst bigint, cos double"
        )
    )


def _knn_cell_topk(pdf):
    """Per-cell all-pairs cosine + top-K, fold-order exact.

    m <= KNN_BUCKET_CAP rows in, <= m*KNN_GRAPH_K rows out. G and s
    accumulate dimension-at-a-time so every dot/norm is the
    LEFT-TO-RIGHT double fold the SQL oracle computes (np.dot/np.sum
    would use pairwise summation and drift in the last ulp). NaN
    cosines are mapped to sort-first on the descending key
    (Spark/DuckDB NaN-is-greatest ordering)."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    m = len(ids)
    if m < 2:
        return pd.DataFrame(
            {
                "src": np.array([], dtype=np.int64),
                "rank": np.array([], dtype=np.int32),
                "dst": np.array([], dtype=np.int64),
                "cos": np.array([], dtype=np.float64),
            }
        )
    X = np.empty((m, len(pdf["embedding"].iloc[0])), dtype=np.float64)
    for r, e in enumerate(pdf["embedding"]):
        X[r, :] = np.asarray(e, dtype=np.float64)
    G = np.zeros((m, m), dtype=np.float64)
    s = np.zeros(m, dtype=np.float64)
    for i in range(X.shape[1]):
        c = X[:, i]
        G += c[:, None] * c[None, :]
        s += c * c
    nrm = np.sqrt(s)
    C = G / (nrm[:, None] * nrm[None, :])
    k = min(KNN_GRAPH_K, m - 1)
    # descending-cos sort key with NaN first (engine ordering); self is
    # excluded by +inf (sorts last, never inside the top k <= m-1)
    key = np.where(np.isnan(C), -np.inf, -C)
    np.fill_diagonal(key, np.inf)
    src, rank, dst, cos = [], [], [], []
    for r in range(m):
        order = np.lexsort((ids, key[r]))[:k]
        src.extend([int(ids[r])] * k)
        rank.extend(range(1, k + 1))
        dst.extend(ids[order])
        cos.extend(C[r, order])
    return pd.DataFrame(
        {
            "src": np.asarray(src, dtype=np.int64),
            "rank": np.asarray(rank, dtype=np.int32),
            "dst": np.asarray(dst, dtype=np.int64),
            "cos": np.asarray(cos, dtype=np.float64),
        }
    )


_SQL_BUCKET_K = (
    "list_aggregate(list_transform(embedding[1:(SELECT dims FROM nd)],"
    " x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), 'string_agg', '')"
)

# the capped-LSH graph as a reusable CTE chain — the graph entry and
# the recall audit share it verbatim, so the two oracles can never
# drift apart
_KNN_GRAPH_CTES = f"""nd AS (
  SELECT GREATEST({KNN_GRAPH_DIMS},
                  CAST(CEIL(LOG2(GREATEST(COUNT(*), 1)
                                 / {KNN_TARGET_BUCKET}.0)) AS INT)) AS dims
  FROM embeddings
),
patted AS (
  SELECT vec_id, embedding, {_SQL_BUCKET_K} AS pat FROM embeddings
),
emb AS (
  SELECT vec_id, embedding, pat,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT)
           % ((COUNT(*) OVER (PARTITION BY pat) + {KNN_BUCKET_CAP} - 1)
              // {KNN_BUCKET_CAP}) AS sub
  FROM patted
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_SQL_COS} AS cos
  FROM emb a JOIN emb b USING (pat, sub)
  WHERE a.vec_id <> b.vec_id
),
knn_graph AS (
  SELECT src, CAST(rank AS INT) AS rank, dst, cos
  FROM (SELECT src, dst, cos,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cos DESC, dst) AS rank
        FROM pairs)
  WHERE rank <= {KNN_GRAPH_K}
)"""

_ANN_KNN_GRAPH_SQL = f"""
WITH {_KNN_GRAPH_CTES}
SELECT src, rank, dst, cos FROM knn_graph
"""


def ann_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the capped-LSH kNN graph: for the bounded
    {N_QUERIES}-vector panel, how many of each vector's TRUE
    top-{KNN_GRAPH_K} cosine neighbors (exact, whole-corpus
    brute force — the ann_topk_bruteforce plan shape: corpus scan ×
    broadcast panel) does the graph actually contain? This is the
    permanent "recall pricing" for the blocked substrate the round-7
    verdict asked about: the LSH trade (same-bucket candidates only +
    the occupancy-cap sub-split) is priced per panel vector as
    hits/{KNN_GRAPH_K}, and any future change to the blocking
    (pattern width, cap, sub-split) re-prices automatically. Both
    sides break cosine ties by ascending neighbor id over bit-identical
    doubles, so the set intersection is engine-exact; queries whose
    graph neighbors were all pruned report 0 hits via the left join
    (a groupBy alone would silently drop them).

    Round 9 adds the TIE-AWARE column pair (dist_hits, dist_recall):
    how many of the graph's kept neighbors are AT LEAST AS CLOSE as
    the true {KNN_GRAPH_K}th neighbor (graph cos >= exact kth cos —
    an exact double comparison, both sides computed by the same
    left-to-right fold, not a tolerance). The round-9 saturated-cap
    measurement (scripts/knn_recall_scale.py, SCALING.md) showed why
    both numbers are needed: at 600 k / 1.2 M / 2.4 M vectors the
    id-recall decays exactly as the md5 sub-split arithmetic predicts
    (0.83 / 0.40 / 0.35 ~ mean 1/n_sub) while dist-recall stays 1.00
    on every panel query — the loss is entirely WITHIN the cos-tie
    set of near-identical mega-bucket members, so the substrate's
    "cap trades which tied neighbor you keep, not how close" claim is
    measured, not asserted. A future corpus where capped buckets are
    NOT near-interchangeable would show up here as dist_recall < 1
    before any consumer silently degrades."""
    from blog_snapshotbackup_azuredatalake_spark.operators.graph import (
        knn_graph_cached,
    )

    graph = knn_graph_cached(spark, sf_dir).filter(
        F.col("src") < N_QUERIES
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        # per-row norm hoisted below the pair join (round 10,
        # `_dot_cos_pre`): folded once per row, not once per pair
        _norm(F.col("embedding")).alias("nrm"),
    )
    panel = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    # round 10: `ranked` used to feed TWO filters (rnk <= K for the
    # exact set, rnk == K for the tie bar), and each DataFrame
    # reference plans its OWN subtree — the committed before-plan
    # (plans/r10/ann_knn_graph_recall_before.txt) shows the whole
    # corpus-sized BroadcastNestedLoopJoin + cosine + window chain
    # TWICE (no ReusedExchange fires across the differing filters), so
    # the dominant brute-force scan ran twice. Filter to the top-K
    # survivors ONCE — WindowGroupLimit(Partial) still applies — and
    # barrier the <= |panel|·K-row result; both consumers then read
    # the tiny materialized relation: one corpus pass instead of two
    # (guide §1.2: remove unnecessary passes).
    topk = (
        ranked.filter(F.col("rnk") <= KNN_GRAPH_K)
        .select("q_id", "vec_id", "cos", "rnk")
        .localCheckpoint(eager=False)
    )
    exact = topk.select(
        F.col("q_id").alias("src"), F.col("vec_id").alias("dst")
    )
    # the exact kth-best cosine is the tie-aware bar: any graph
    # neighbor at or above it is as close as a "true" neighbor
    kth = topk.filter(F.col("rnk") == KNN_GRAPH_K).select(
        F.col("q_id").alias("src"), F.col("cos").alias("kth_cos")
    )
    hits = (
        exact.join(graph.select("src", "dst"), ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    dhits = (
        graph.select("src", "cos")
        .join(kth, "src")
        .filter(F.col("cos") >= F.col("kth_cos"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("dist_hits"))
    )
    return (
        panel.select(F.col("q_id").alias("src"))
        .join(hits, "src", "left")
        .join(dhits, "src", "left")
        .select(
            "src",
            F.coalesce(F.col("hits"), F.lit(0)).cast("int").alias("hits"),
            (
                F.coalesce(F.col("hits"), F.lit(0))
                / F.lit(float(KNN_GRAPH_K))
            ).alias("recall"),
            F.coalesce(F.col("dist_hits"), F.lit(0))
            .cast("int")
            .alias("dist_hits"),
            (
                F.coalesce(F.col("dist_hits"), F.lit(0))
                / F.lit(float(KNN_GRAPH_K))
            ).alias("dist_recall"),
        )
    )


_ANN_KNN_RECALL_SQL = f"""
WITH {_KNN_GRAPH_CTES},
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
rk AS (
  SELECT q_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, vec_id) AS rn
  FROM (SELECT q_id, b.vec_id,
               {_sql_cos("q_emb", "b.embedding")} AS cos
        FROM q JOIN embeddings b ON b.vec_id <> q_id)
),
ex AS (
  SELECT q_id AS src, vec_id AS dst FROM rk WHERE rn <= {KNN_GRAPH_K}
),
kth AS (
  SELECT q_id AS src, cos AS kth_cos FROM rk WHERE rn = {KNN_GRAPH_K}
),
hits AS (
  SELECT ex.src, COUNT(*) AS hits
  FROM ex JOIN knn_graph g ON g.src = ex.src AND g.dst = ex.dst
  GROUP BY ex.src
),
dhits AS (
  SELECT g.src, COUNT(*) AS dist_hits
  FROM knn_graph g JOIN kth ON kth.src = g.src
  WHERE g.cos >= kth.kth_cos
  GROUP BY g.src
)
SELECT q.q_id AS src, CAST(COALESCE(h.hits, 0) AS INT) AS hits,
       COALESCE(h.hits, 0) / {KNN_GRAPH_K}.0 AS recall,
       CAST(COALESCE(d.dist_hits, 0) AS INT) AS dist_hits,
       COALESCE(d.dist_hits, 0) / {KNN_GRAPH_K}.0 AS dist_recall
FROM q LEFT JOIN hits h ON h.src = q.q_id
       LEFT JOIN dhits d ON d.src = q.q_id
"""


PQ_M = 32  # subspaces (64-dim → 2 dims each)
PQ_SUBDIM = 2
PQ_K = 16  # codes per subspace → one byte-nibble per subspace
PQ_FP = 1 << 20  # fixed-point scale for ADC table entries
PQ_SHORTLIST = 20  # ADC candidates per query kept for exact re-rank
def _adc_shortlist(scored: DataFrame) -> DataFrame:
    """Top-PQ_SHORTLIST per query over the corpus-sized ADC scan.

    Round-10 decision (plans/r10/emb_pq_adc_before.txt): the round-9
    verdict prescribed a salted two-phase rewrite of this window on the
    premise that it shuffles |corpus|·|Q| rows into |Q| = 20 sort
    tasks. Spark 4.1's rank-limit pushdown (SPARK-37099) already plans
    this exact shape as `Sort → WindowGroupLimit(Partial, k=20) →
    Exchange(q_id) → WindowGroupLimit(Final) → Window`: every MAP task
    locally sorts its slice and keeps its own top-20 per query, the
    exchange carries ≤ maptasks·|Q|·20 rows, and the 20 reduce
    partitions sort only those survivors. That IS the two-phase
    partial top-k, done engine-side with one exchange; an explicit
    salted rewrite was measured/plan-verified to add a second exchange
    and TOPK_SALT× more shuffled survivors for the same local sort
    work, so the single window stays."""
    ws = Window.partitionBy("q_id").orderBy("adc_fp", "vec_id")
    return (
        scored.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= PQ_SHORTLIST)
        .select("q_id", "vec_id", "adc_fp")
    )


def _pq_l2(a: list, b: list) -> float:
    acc = 0.0  # left-to-right fold — same order as both engines
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _pq_sub(v: list, s: int) -> list:
    return v[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]


def _pq_codebook(emb: DataFrame) -> tuple[dict, list]:
    """Deterministic first-PQ_K seed codebook (as ann_topk_ivf seeds
    its lists) — KBs at any corpus size, driver-held by design."""
    cb_rows = emb.filter(F.col("vec_id") < PQ_K).collect()
    cb = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in cb_rows
    }
    return cb, sorted(cb)


def _pq_query_tables(q_rows: list, cb: dict, ks: list) -> list:
    """Per-query fixed-point ADC tables (floor(d²·2²⁰) BIGINTs) — the
    scan's per-pair sum is integer-exact, order-independent, and
    engine-portable."""
    import math

    qtabs = []
    for qr in sorted(q_rows, key=lambda r: r["vec_id"]):
        qv = [float(x) for x in qr["embedding"]]
        t = []
        for s in range(PQ_M):
            for k in ks:
                t.append(
                    int(
                        math.floor(
                            _pq_l2(_pq_sub(qv, s), _pq_sub(cb[k], s)) * PQ_FP
                        )
                    )
                )
        qtabs.append((int(qr["vec_id"]), t))
    return qtabs


def _pq_encode_sql(cb: dict, ks: list, col: str = "embedding") -> str:
    """The whole PQ_M×PQ_K codebook-argmin expression emitted as ONE
    SQL string parsed in a single F.expr call. Building it through the
    Column API costs one Py4J round-trip per operator node (~8k trips
    ≈ 20 s of pure driver latency, flat at every SF); the string goes
    over the wire once. Same left-to-right double arithmetic, so encode
    parity with the oracle and the driver-side tables holds.

    The ~128 KB expression FAILS whole-stage codegen (janino method-
    size) and runs interpreted — measured NOT worth fixing (round 7,
    600 k vectors, warm min-of-2): this unrolled form 6.5 s vs a
    nested higher-order-function loop (tiny expression tree, codebook
    as array literal) 18.0 s and an Arrow/numpy pandas-UDF encode
    18.9 s, all three bit-identical on 2 000 checked rows. The
    interpreted unrolled tree evaluates constant-folded literals with
    no per-element lambda dispatch and no Arrow transfer — keep it;
    the codegen WARN on stderr is the cost."""

    def d2_sql(s: int, vals: list) -> str:
        terms = []
        for i, v in enumerate(vals):
            x = f"cast(element_at({col}, {s * PQ_SUBDIM + i + 1}) as double)"
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


def emb_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scan + exact
    refine (faiss's IndexPQ + refine recipe): the corpus compresses to
    PQ_M 4-bit sub-codes — 16 bytes instead of 256 per 64-dim float
    vector, the 16× memory cut that lets a 100 TB embedding corpus live
    executor-resident — each query scans codes via a precomputed
    per-subspace distance table (PQ_M lookups/vector, no float math in
    the scan), and only the PQ_SHORTLIST quantized survivors per query
    rejoin their float vectors for the exact L2 re-rank (measured
    recall@5 vs exact: 0.84 at sf0.01, on embeddings with no cluster
    structure — PQ's worst case).

    Spark shape: encoding is MAP-ONLY (per-subspace argmin against the
    literal-bound codebook, the ``_assign`` trick — the corpus is never
    shuffled to get coded); query ADC tables are fixed-point BIGINTs
    (floor(d²·2²⁰)) bound as literals, so the scan's per-pair sum is
    integer-exact, order-independent, and engine-portable. Shuffles
    touch only the shortlist windows: the scan emits |corpus|·|Q|
    (bigint, bigint) scored rows — same scan complexity as brute force
    but integer lookups over 16× smaller data — and the refine join
    carries |Q|·PQ_SHORTLIST rows. The codebook (deterministic
    first-PQ_K seed vectors, as ann_topk_ivf seeds its lists) and
    tables are KBs at any corpus size. Note: the PQ_M×PQ_K argmin tree
    exceeds the JVM's 64KB generated-method limit, so Spark logs a
    one-time codegen ERROR and evaluates it interpreted — fine for the
    plan-shape demo; the throughput deployment swaps the encode for the
    Arrow/numpy batch kernel (see ann_topk_arrow and SCALING.md's
    kernel-path table), keeping the identical code assignment."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb, ks = _pq_codebook(emb)
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    qtabs = _pq_query_tables(q_rows, cb, ks)
    # derived-array-under-join barrier (round 9, same class as the two
    # IVFPQ variants): without it the ~128 KB interpreted encode
    # re-evaluates under the |Q|-way crossJoin fan-out — fresh min-of-N
    # 37.8/35.6 s at 1.2 M/2.4 M vectors vs 18.9/32.8 s with the
    # barrier. Both variants show large warm-run variance at 2.4 M
    # (repeat runs to 110-150 s — heap churn from the 48 M-row ADC
    # window sort), so min-of-N fresh decides per the house rule
    # (SCALING.md round 9)
    encoded = emb.select(
        "vec_id", F.expr(_pq_encode_sql(cb, ks)).alias("codes")
    ).localCheckpoint(eager=False)
    # the |Q|×(PQ_M·PQ_K) table set rides as broadcast DATA, not as ~10k
    # literal expression nodes — the one-row-per-query frame crossJoins
    # onto the coded scan (same shape as ann_topk_bruteforce's query
    # broadcast; the big side streams map-only)
    qdf = spark.createDataFrame(qtabs, "q_id bigint, t array<bigint>")
    scored = (
        encoded.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(
                f"aggregate(transform(codes, (c, s) -> t[s * {len(ks)} + c]),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("adc_fp"),
        )
    )
    shortlist = _adc_shortlist(scored)
    # exact re-rank of the quantized shortlist (faiss's refine step):
    # |Q|·PQ_SHORTLIST rows rejoin their float vectors — the only float
    # math after the scan, and the only rows that ever carry vectors
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    reranked = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            "adc_fp",
            _l2sq(F.col("q_emb"), F.col("embedding")).alias("d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    return (
        reranked.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "q_id", "vec_id", "adc_fp", "d2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_PQ_ADC_SQL = f"""
WITH sub AS (
  SELECT vec_id, s,
         embedding[s * {PQ_SUBDIM} + 1 : s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM embeddings, UNNEST(range(0, {PQ_M})) AS r(s)
), cbi AS (
  SELECT s, sv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS j
  FROM sub WHERE vec_id < {PQ_K}
), encoded AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT v.vec_id, v.s, c.j,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_SQL_L2SQ.format(a="v.sv", b="c.sv")}, c.j) AS rn
    FROM sub v JOIN cbi c ON v.s = c.s)
  WHERE rn = 1
), qtab AS (
  SELECT q.vec_id AS q_id, q.s, c.j,
         CAST(floor({_SQL_L2SQ.format(a="q.sv", b="c.sv")} * {PQ_FP})
              AS BIGINT) AS dfp
  FROM sub q JOIN cbi c ON q.s = c.s
  WHERE q.vec_id < {N_QUERIES}
), adc AS (
  SELECT t.q_id, e.vec_id, SUM(t.dfp) AS adc_fp
  FROM encoded e JOIN qtab t ON e.s = t.s AND e.code = t.j
  WHERE e.vec_id <> t.q_id
  GROUP BY t.q_id, e.vec_id
), shortlist AS (
  SELECT q_id, vec_id, adc_fp FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc_fp, vec_id) AS srnk
    FROM adc)
  WHERE srnk <= {PQ_SHORTLIST}
), reranked AS (
  SELECT s.q_id, s.vec_id, CAST(s.adc_fp AS BIGINT) AS adc_fp,
         {_SQL_L2SQ.format(a='q.embedding', b='b.embedding')} AS d2
  FROM shortlist s
  JOIN embeddings b ON b.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = s.q_id
)
SELECT q_id, vec_id, adc_fp, d2, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY d2, vec_id) AS rnk
      FROM reranked)
WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF inverted-list balance audit
# ---------------------------------------------------------------------------

BALANCE_FP = 1 << 20  # fixed-point scale for share/imbalance ratios
BALANCE_HOT = 2  # a list above 2× its fair share is flagged hot


def ann_index_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy certificate for the IVF index the ANN family deploys:
    per inverted list, vector count, corpus share, and the imbalance
    factor n·NLIST/total (1.0 = perfectly balanced). This is the audit
    run before trusting an IVF index at scale — a hot list is BOTH the
    straggler (its in-list scan dominates probe latency) and the recall
    risk (queries probing it drown in candidates while starved lists
    contribute none). All ratios are integer fixed-point (BIGINT `div`,
    exact in both engines); the plan is the map-only coarse assignment
    followed by a {IVF_NLIST}-cell count — nothing corpus-sized
    shuffles, and the one-row total rides the certificate-merge
    crossJoin."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sorted(
        emb.filter(F.col("vec_id") < IVF_NLIST)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
        .collect(),
        key=lambda r: r["centroid_id"],
    )
    assigned = emb.withColumn("cents", _cents_lit_of(cents)).select(
        F.array_min(_cent_scored(F.col("embedding")))["centroid_id"].alias(
            "list_id"
        )
    )
    lists = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    total = lists.agg(F.sum("n_vectors").alias("total"))
    return lists.crossJoin(F.broadcast(total)).select(
        "list_id",
        "n_vectors",
        F.expr(f"n_vectors * {BALANCE_FP}L div total")
        .cast("bigint")
        .alias("share_fp"),
        F.expr(f"n_vectors * {IVF_NLIST}L * {BALANCE_FP}L div total")
        .cast("bigint")
        .alias("imbalance_fp"),
        (
            F.expr(f"n_vectors * {IVF_NLIST}L * {BALANCE_FP}L div total")
            > BALANCE_HOT * BALANCE_FP
        ).alias("is_hot"),
    )


_INDEX_BALANCE_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, centroid_id AS list_id
  FROM (SELECT e.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), lists AS (
  SELECT list_id, COUNT(*) AS n_vectors FROM assigned GROUP BY list_id
), total AS (SELECT SUM(n_vectors) AS total FROM lists)
SELECT list_id, n_vectors,
       CAST(n_vectors * {BALANCE_FP} // total AS BIGINT) AS share_fp,
       CAST(n_vectors * {IVF_NLIST} * {BALANCE_FP} // total AS BIGINT)
         AS imbalance_fp,
       n_vectors * {IVF_NLIST} * {BALANCE_FP} // total
         > {BALANCE_HOT * BALANCE_FP} AS is_hot
FROM lists CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# nprobe tuning curve (recall / candidate cost per probe budget)
# ---------------------------------------------------------------------------

NPROBE_GRID = (1, 2, 4, 8)


def ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe tuning curve as data: aggregate recall@{TOP_K}
    and candidate cost for every probe budget in {NPROBE_GRID}, from
    ONE pass — the recall-vs-latency trade every IVF deployment tunes,
    answered by a query instead of N redeployed runs. Each candidate
    pair is tagged with the probe rank `p` of the list it came from;
    budget v's candidate set is simply p ≤ v, so one scored-pair
    relation (computed at the LARGEST budget) serves every curve point
    via a {len(NPROBE_GRID)}-row broadcast values join, one window per
    (query, budget), and a join against the exact baseline. Corpus-side
    work is the same map-only assign + broadcast probe join as
    ann_topk_ivf — at max(grid) probes — regardless of grid size;
    integer fixed-point recall (n_hit·2²⁰ div k)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cents_lit = _cents_lit_of(cents)
    max_probe = max(NPROBE_GRID)
    assigned = emb.withColumn("cents", cents_lit).select(
        "vec_id",
        "embedding",
        F.array_min(_cent_scored(F.col("embedding")))["centroid_id"].alias(
            "list_id"
        ),
        # per-row norm hoisted below the probe join (round 10,
        # `_dot_cos_pre`): folded once per row, not once per pair
        _norm(F.col("embedding")).alias("nrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    probes = (
        queries.withColumn("cents", cents_lit)
        .select(
            "q_id",
            "q_emb",
            "q_nrm",
            F.posexplode(
                F.slice(
                    F.array_sort(_cent_scored(F.col("q_emb"))), 1, max_probe
                )
            ).alias("p0", "pr"),
        )
        .select(
            "q_id",
            "q_emb",
            "q_nrm",
            (F.col("p0") + 1).cast("int").alias("p"),  # 1-based probe rank
            F.col("pr.centroid_id").alias("list_id"),
        )
    )
    pairs = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "p",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    grid = spark.createDataFrame(
        [(int(v),) for v in NPROBE_GRID], "nprobe int"
    )
    cands = pairs.join(F.broadcast(grid), F.col("p") <= F.col("nprobe"))
    w = Window.partitionBy("q_id", "nprobe").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    topk = cands.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    exact = ann_topk_bruteforce(spark, sf_dir).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    )
    hits = topk.join(exact, ["q_id", "vec_id"], "left_outer")
    # round 10 NEGATIVE A/B, kept as-was by measurement: n_candidates
    # below re-references the corpus-sized `cands`, which plans as its
    # own full subtree — but Catalyst's COLUMN PRUNING already strips
    # the cosine from that counting copy (the committed before-plan's
    # count-side Project carries only the centroid-argmin assign, no
    # zip_with fold), so the "duplicated pass" costs one assign-only
    # scan, not a second cosine pass. A restructure that derived the
    # counts from 16-row list occupancies (occupancy minus one iff the
    # query's own vector lives in the probed list — same values, no
    # pair relation) measured SLOWER in three independent fresh-session
    # sf60de pairs (old/new warm min: 6.6/12.6, 7.3/8.2, 48.3/59.5 s):
    # it swapped the pruned scan for extra broadcast stages and an
    # exchange. Lesson recorded in OPTIMIZATION_r10.md — check what
    # pruning already removed before deduplicating a subtree.
    return (
        hits.groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).alias("k_total"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).alias(
                "n_hits"
            ),
        )
        .join(
            cands.groupBy("nprobe").agg(
                F.count(F.lit(1)).alias("n_candidates")
            ),
            "nprobe",
        )
        .select(
            "nprobe",
            "n_candidates",
            "k_total",
            "n_hits",
            F.expr(f"n_hits * {BALANCE_FP}L div k_total")
            .cast("bigint")
            .alias("recall_fp"),
        )
    )


def _nprobe_curve_sql() -> str:
    grid_rows = ", ".join(f"({v})" for v in NPROBE_GRID)
    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, embedding, centroid_id AS list_id
  FROM (SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), probes AS (
  SELECT q_id, q_emb, CAST(pr AS INT) AS p, list_id
  FROM (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
               c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < {N_QUERIES})
  WHERE pr <= {max(NPROBE_GRID)}
), pairs AS (
  SELECT q_id, b.vec_id AS vec_id, p,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cos
  FROM probes JOIN assigned b USING (list_id)
  WHERE b.vec_id <> q_id
), grid(nprobe) AS (VALUES {grid_rows}),
cands AS (
  SELECT q_id, vec_id, cos, nprobe FROM pairs JOIN grid ON p <= nprobe
), topk AS (
  SELECT q_id, vec_id, nprobe FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, nprobe
                                 ORDER BY cos DESC, vec_id) AS rnk
    FROM cands)
  WHERE rnk <= {TOP_K}
), ex AS ({_ANN_BRUTE_SQL}),
hits AS (
  SELECT t.nprobe, COUNT(*) AS k_total,
         CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM topk t LEFT JOIN ex e ON e.q_id = t.q_id AND e.vec_id = t.vec_id
  GROUP BY t.nprobe
), ccount AS (
  SELECT nprobe, COUNT(*) AS n_candidates FROM cands GROUP BY nprobe
)
SELECT h.nprobe, c.n_candidates, h.k_total, h.n_hits,
       CAST(h.n_hits * {BALANCE_FP} // h.k_total AS BIGINT) AS recall_fp
FROM hits h JOIN ccount c ON h.nprobe = c.nprobe
"""


# ---------------------------------------------------------------------------
# incremental IVF maintenance (upsert a new vector batch into the index)
# ---------------------------------------------------------------------------

UPSERT_MOD = 10  # vec_id % 10 == 0 plays the newly-arriving batch


def ann_ivf_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the vector-store upsert loop
    (the ANN analog of ``dedup_incremental``): a newly-arrived batch
    (vec_id % {UPSERT_MOD} == 0 plays it) is coarse-assigned with the
    SAME map-only literal-centroid argmin the index was built with, and
    the operator emits the per-list merge plan: size before, vectors
    added, size after, fixed-point growth, and the rebalance flag
    (n_after above 2× fair share ⇒ that list wants a split / the
    quantizer wants retraining). Only the BATCH is assigned fresh work
    in production — the `n_before` side is the index's stored list
    metadata, recomputed here from the base corpus only because this
    repo's snapshots are the storage layer; either way nothing shuffles
    but {IVF_NLIST}-cell count tables. Integer `div` arithmetic keeps
    every ratio engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sorted(
        emb.filter(F.col("vec_id") < IVF_NLIST)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
        .collect(),
        key=lambda r: r["centroid_id"],
    )
    assigned = emb.withColumn("cents", _cents_lit_of(cents)).select(
        "vec_id",
        F.array_min(_cent_scored(F.col("embedding")))["centroid_id"].alias(
            "list_id"
        ),
    )
    is_new = F.col("vec_id") % UPSERT_MOD == 0
    lists = assigned.groupBy("list_id").agg(
        F.sum(F.when(~is_new, 1).otherwise(0)).alias("n_before"),
        F.sum(F.when(is_new, 1).otherwise(0)).alias("n_added"),
    )
    total = lists.agg(
        F.sum(F.col("n_before") + F.col("n_added")).alias("total")
    )
    return lists.crossJoin(F.broadcast(total)).select(
        "list_id",
        "n_before",
        "n_added",
        (F.col("n_before") + F.col("n_added")).alias("n_after"),
        F.expr(
            f"n_added * {BALANCE_FP}L div greatest(n_before, 1L)"
        )
        .cast("bigint")
        .alias("growth_fp"),
        (
            F.expr(
                f"(n_before + n_added) * {IVF_NLIST}L * {BALANCE_FP}L"
                " div total"
            )
            > BALANCE_HOT * BALANCE_FP
        ).alias("needs_rebalance"),
    )


_IVF_UPSERT_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, centroid_id AS list_id
  FROM (SELECT e.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), lists AS (
  SELECT list_id,
         CAST(SUM(CASE WHEN vec_id % {UPSERT_MOD} <> 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN vec_id % {UPSERT_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_added
  FROM assigned GROUP BY list_id
), total AS (SELECT SUM(n_before + n_added) AS total FROM lists)
SELECT list_id, n_before, n_added,
       n_before + n_added AS n_after,
       CAST(n_added * {BALANCE_FP} // GREATEST(n_before, 1) AS BIGINT)
         AS growth_fp,
       (n_before + n_added) * {IVF_NLIST} * {BALANCE_FP} // total
         > {BALANCE_HOT * BALANCE_FP} AS needs_rebalance
FROM lists CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# PQ per-subspace residual-energy audit
# ---------------------------------------------------------------------------

PQERR_FP = 1 << 30  # fixed-point scale for per-subspace min-d2 errors


def _pq_err_sql(cb: dict, ks: list) -> str:
    """Like ``_pq_encode_sql`` but emits floor(min-d²·2³⁰) per subspace
    — the quantization error of the chosen codeword, in the same ONE
    literal SQL string (argmin and its achieved distance come from the
    same struct array_min, so error parity holds wherever encode parity
    does)."""

    def d2_sql(s: int, vals: list) -> str:
        terms = []
        for i, v in enumerate(vals):
            x = f"cast(element_at(embedding, {s * PQ_SUBDIM + i + 1}) as double)"
            c = f"cast('{float(v)!r}' as double)"
            terms.append(f"({x} - {c}) * ({x} - {c})")
        return " + ".join(terms)

    def err_sql(s: int) -> str:
        structs = ", ".join(
            f"named_struct('d2', {d2_sql(s, _pq_sub(cb[k], s))}, 'j', {j})"
            for j, k in enumerate(ks)
        )
        return (
            f"cast(floor(array_min(array({structs})).d2 * {PQERR_FP})"
            " as bigint)"
        )

    return "array(" + ", ".join(err_sql(s) for s in range(PQ_M)) + ")"


def emb_pq_residual_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ quantization-error audit: mean and max
    floor-fixed-point residual d² per subspace, plus each subspace's
    share of the total error — the which-subspaces-need-more-codewords
    decision (a subspace carrying 10× the residual energy is where
    recall leaks; the fix is more bits there or an OPQ rotation). Same
    map-only literal-codebook pass as the encoder (the achieved min-d²
    rides out of the same array_min struct), then one
    {PQ_M}-cell aggregate; integer `div` ratios keep the certificate
    engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb, ks = _pq_codebook(emb)
    # evaluate the PQ_M×PQ_K literal-codebook expression ONCE per row
    # and cut lineage before the Generate: feeding the ~16k-node
    # interpreted expression (codegen gives up at 64KB, as emb_pq_adc
    # documents) directly into posexplode OOMs the driver-side plan;
    # the checkpointed relation is just (vec_id, 32 bigints) — linear
    err_arr = emb.select(
        F.expr(_pq_err_sql(cb, ks)).alias("errs")
    ).localCheckpoint(eager=True)
    errs = err_arr.select(
        F.posexplode("errs").alias("p", "err_fp")
    ).select(F.col("p").cast("int").alias("s"), "err_fp")
    # DECIMAL(38,0) accumulators (ADD-only, the q1 recipe): err_fp is
    # up to ~2³⁰·d², so a BIGINT Σ survives ~1 M vectors but the
    # ·2²⁰ share multiply overflowed int64 AT 1.2 M (found by the
    # round-7 sf60 cold suite as an ANSI ARITHMETIC_OVERFLOW crash) —
    # and at the 100 TB design point the Σ itself would too.
    per = errs.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("err_fp").cast("decimal(38,0)")).alias("sum_err_fp"),
        F.max("err_fp").alias("max_err_fp"),
    )
    total = per.agg(F.sum("sum_err_fp").alias("tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "s",
        "n_vectors",
        F.expr("sum_err_fp div n_vectors").cast("bigint").alias("mean_err_fp"),
        "max_err_fp",
        # greatest(·,1): tot is 0 when every vector reconstructs
        # exactly (all-zero residuals) — Spark div would NULL, DuckDB
        # // would raise; share is 0 there either way. All-integral
        # decimal arithmetic: div truncation == // floor on
        # non-negative operands, engine-exact.
        F.expr(
            f"(sum_err_fp * {BALANCE_FP}) div"
            " greatest(tot, cast(1 as decimal(38,0)))"
        )
        .cast("bigint")
        .alias("err_share_fp"),
    )


_PQ_RESIDUAL_SQL = f"""
WITH sub AS (
  SELECT vec_id, s,
         embedding[s * {PQ_SUBDIM} + 1 : s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM embeddings, UNNEST(range(0, {PQ_M})) AS r(s)
), cbi AS (
  SELECT s, sv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS j
  FROM sub WHERE vec_id < {PQ_K}
), errs AS (
  SELECT v.vec_id, v.s,
         CAST(floor(MIN({_SQL_L2SQ.format(a="v.sv", b="c.sv")})
                    * {PQERR_FP}) AS BIGINT) AS err_fp
  FROM sub v JOIN cbi c ON v.s = c.s
  GROUP BY v.vec_id, v.s
), per AS (
  SELECT s, COUNT(*) AS n_vectors, SUM(err_fp) AS sum_err_fp,
         MAX(err_fp) AS max_err_fp
  FROM errs GROUP BY s
), total AS (SELECT SUM(sum_err_fp) AS tot FROM per)
SELECT CAST(s AS INT) AS s, n_vectors,
       CAST(sum_err_fp // n_vectors AS BIGINT) AS mean_err_fp,
       CAST(max_err_fp AS BIGINT) AS max_err_fp,
       CAST(sum_err_fp * {BALANCE_FP} // GREATEST(tot, 1) AS BIGINT)
         AS err_share_fp
FROM per CROSS JOIN total
"""
# oracle note: DuckDB's SUM(BIGINT) already promotes to exact HUGEINT
# (int128) and `//` on integers is exact floor division — the oracle
# never had the int64 overflow, only Spark did. DECIMAL // in DuckDB
# ROUNDS instead of truncating (measured off-by-one at sf0.01), so the
# oracle stays on native integer arithmetic; Spark's decimal `div` is
# BigDecimal divideToIntegralValue — exact truncation, which equals
# floor on these non-negative operands.


# ---------------------------------------------------------------------------
# IVF + PQ: the production ANN composition (coarse pruning × compression)
# ---------------------------------------------------------------------------


def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ ANN — the faiss IVFPQ recipe (shared-codebook variant,
    ``by_residual=false``): the corpus is coarse-assigned to IVF_NLIST
    inverted lists AND PQ-encoded to {PQ_M} 4-bit sub-codes in ONE
    map-only pass (both the centroid argmin and the codebook argmin are
    literal-bound expressions — the corpus never shuffles to get
    indexed), queries probe their {IVF_NPROBE} nearest lists, and the
    ADC table scan runs ONLY inside probed lists. That composition is
    the actual production win over the repo's two single-technique
    operators: `emb_pq_adc` scans |corpus|·|Q| code rows (compression
    without pruning), `ann_topk_ivf` re-ranks probed lists with full
    float vectors (pruning without compression) — here the scan cost
    drops to |corpus|·NPROBE/NLIST per query over 16×-compressed codes,
    which is what lets a 100 TB corpus answer from executor-resident
    index shards. The {PQ_SHORTLIST}-candidate quantized shortlist per
    query then rejoins float vectors for the exact L2 refine, exactly
    as emb_pq_adc documents. Fixed-point ADC tables keep every score a
    BIGINT (order-independent, engine-portable); shuffles touch only
    the per-query shortlist windows."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sorted(
        emb.filter(F.col("vec_id") < IVF_NLIST)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
        .collect(),
        key=lambda r: r["centroid_id"],
    )
    cents_lit = _cents_lit_of(cents)
    cb, ks = _pq_codebook(emb)
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    qtabs = _pq_query_tables(q_rows, cb, ks)
    # ONE corpus pass builds the whole index row: inverted-list id +
    # PQ codes, both map-only literal-expression argmins. The
    # localCheckpoint is the derived-array-under-join barrier (the
    # round-8 residual-IVFPQ trap class): without it the ~128 KB
    # interpreted encode projection re-evaluates per JOIN-OUTPUT row
    # of the probe join below (|Q|·NPROBE/NLIST ≈ 5 evals per corpus
    # row here), which round 9 measured as the variant's super-linear
    # wall-clock edge — fresh min-of-2 55.3/165.3 s at 2.4 M/4.8 M
    # vectors (alpha 1.58, heap-pressure inflected: the warm second
    # run came out SLOWER than the cold one) collapsing to
    # 34.8/50.9 s (alpha 0.55) with the barrier (SCALING.md round 9).
    # It is also semantically the faiss-faithful artifact: the
    # PQ-coded index is MATERIALIZED once at build time, then scanned.
    coded = (
        emb.withColumn("cents", cents_lit)
        .select(
            "vec_id",
            F.array_min(_cent_scored(F.col("embedding")))[
                "centroid_id"
            ].alias("list_id"),
            F.expr(_pq_encode_sql(cb, ks)).alias("codes"),
        )
        .localCheckpoint(eager=False)
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probes = (
        queries.withColumn("cents", cents_lit)
        .select(
            "q_id",
            F.explode(
                F.slice(
                    F.array_sort(_cent_scored(F.col("q_emb"))), 1, IVF_NPROBE
                )
            ).alias("pr"),
        )
        .select("q_id", F.col("pr.centroid_id").alias("list_id"))
    )
    # |Q|·NPROBE probe rows carry their ADC tables as broadcast DATA
    qdf = spark.createDataFrame(qtabs, "q_id bigint, t array<bigint>")
    probes_t = probes.join(qdf, "q_id")
    scored = (
        coded.join(F.broadcast(probes_t), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(
                f"aggregate(transform(codes, (c, s) -> t[s * {len(ks)} + c]),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("adc_fp"),
        )
    )
    shortlist = _adc_shortlist(scored)
    reranked = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            "adc_fp",
            _l2sq(F.col("q_emb"), F.col("embedding")).alias("d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    return (
        reranked.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "q_id", "vec_id", "adc_fp", "d2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_IVFPQ_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, centroid_id AS list_id
  FROM (SELECT e.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), probes AS (
  SELECT q_id, list_id
  FROM (SELECT q.vec_id AS q_id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < {N_QUERIES})
  WHERE pr <= {IVF_NPROBE}
), sub AS (
  SELECT vec_id, s,
         embedding[s * {PQ_SUBDIM} + 1 : s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM embeddings, UNNEST(range(0, {PQ_M})) AS r(s)
), cbi AS (
  SELECT s, sv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS j
  FROM sub WHERE vec_id < {PQ_K}
), encoded AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT v.vec_id, v.s, c.j,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_SQL_L2SQ.format(a="v.sv", b="c.sv")}, c.j) AS rn
    FROM sub v JOIN cbi c ON v.s = c.s)
  WHERE rn = 1
), qtab AS (
  SELECT q.vec_id AS q_id, q.s, c.j,
         CAST(floor({_SQL_L2SQ.format(a="q.sv", b="c.sv")} * {PQ_FP})
              AS BIGINT) AS dfp
  FROM sub q JOIN cbi c ON q.s = c.s
  WHERE q.vec_id < {N_QUERIES}
), adc AS (
  SELECT t.q_id, e.vec_id, SUM(t.dfp) AS adc_fp
  FROM encoded e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN probes p ON p.list_id = a.list_id
  JOIN qtab t ON t.q_id = p.q_id AND t.s = e.s AND t.j = e.code
  WHERE e.vec_id <> p.q_id
  GROUP BY t.q_id, e.vec_id
), shortlist AS (
  SELECT q_id, vec_id, adc_fp FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc_fp, vec_id) AS srnk
    FROM adc)
  WHERE srnk <= {PQ_SHORTLIST}
), reranked AS (
  SELECT s.q_id, s.vec_id, CAST(s.adc_fp AS BIGINT) AS adc_fp,
         {_SQL_L2SQ.format(a='q.embedding', b='b.embedding')} AS d2
  FROM shortlist s
  JOIN embeddings b ON b.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = s.q_id
)
SELECT q_id, vec_id, adc_fp, d2, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY d2, vec_id) AS rnk
      FROM reranked)
WHERE rnk <= {TOP_K}
"""


def ann_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ with RESIDUAL encoding (faiss ``by_residual=true`` — its
    actual default, and the variant the shared-codebook
    `ann_topk_ivfpq` docstring leaves on the table): the PQ quantizes
    ``v − c_list(v)`` instead of ``v``, so the codebook only has to
    cover the residual ball around each centroid rather than the whole
    embedding space — same code budget, finer effective resolution
    (the classic IVFADC construction from Jégou et al.'s
    product-quantization paper, public). The price is that ADC tables
    become per-(query, probed-list) — ``||(q − c_l) − code||²`` —
    |Q|·NPROBE tables instead of |Q|, still KBs, still broadcast DATA.

    Plan shape matches ann_topk_ivfpq: ONE map-only corpus pass does
    coarse assign + residual + PQ encode (centroids and the residual
    codebook ride in as literals/driver tables; the corpus never
    shuffles to get indexed), probed-list ADC scan, per-query
    shortlist window, exact float re-rank of {PQ_SHORTLIST}
    candidates. Residual seeds are the first {PQ_K} vectors'
    engine-computed residuals (collected, so Spark literal == oracle
    arithmetic bit-for-bit); fixed-point BIGINT ADC scores keep the
    scan order-independent and engine-portable."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sorted(
        emb.filter(F.col("vec_id") < IVF_NLIST)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
        .collect(),
        key=lambda r: r["centroid_id"],
    )
    cents_lit = _cents_lit_of(cents)
    cmap = {int(c["centroid_id"]): [float(x) for x in c["c_emb"]] for c in cents}
    # The positional element_at(_cbc, list_id + 1) below is only correct
    # while centroid ids are exactly the dense vec_ids 0..IVF_NLIST-1
    # (the oracle joins BY ID); enforce the assumption instead of
    # leaving it implicit (round-7 ADVICE) so a future sparse seed set
    # fails loudly here, not as a silent Spark/oracle desync.
    assert sorted(cmap) == list(range(IVF_NLIST)), (
        f"residual IVFPQ requires dense centroid ids 0..{IVF_NLIST - 1}; "
        f"got {sorted(cmap)}"
    )
    # centroid embeddings indexed by list_id for the residual subtract
    cbyid = F.array(
        *[
            F.array(*[F.lit(v) for v in cmap[cid]])
            for cid in sorted(cmap)
        ]
    )
    resid = (
        emb.withColumn("cents", cents_lit)
        .select(
            "vec_id",
            "embedding",
            F.array_min(_cent_scored(F.col("embedding")))[
                "centroid_id"
            ].alias("list_id"),
        )
        .withColumn("_cbc", cbyid)
        .select(
            "vec_id",
            "list_id",
            F.zip_with(
                F.col("embedding"),
                F.element_at(F.col("_cbc"), (F.col("list_id") + 1).cast("int")),
                lambda x, y: x.cast("double") - y,
            ).alias("resid"),
        )
    )
    # residual codebook: the first PQ_K vectors' ENGINE-computed
    # residuals (collect keeps Spark/oracle arithmetic identical; the
    # vec_id < PQ_K filter pushes to the scan, so this is a 16-row pass)
    seed = sorted(
        resid.filter(F.col("vec_id") < PQ_K).collect(),
        key=lambda r: r["vec_id"],
    )
    cbr = {int(r["vec_id"]): [float(x) for x in r["resid"]] for r in seed}
    ksr = sorted(cbr)
    # THE BARRIER BELONGS ON THE CODES, NOT THE RESIDUALS (round-8
    # measured decomposition, SCALING.md): leaving the 128 KB encode
    # projection under the interpreted broadcast-join re-evaluated it
    # per JOIN-OUTPUT row (~NPROBE·|Q|/NLIST ≈ 5× per corpus row —
    # scored stage 190.7 s at 1.2 M vectors), while the checkpointed
    # coded index serves the same scan in 1.7 s. It is also the
    # faithful faiss artifact: a real pipeline persists the PQ-coded
    # inverted lists, not the float residuals. Round 7's wash A/B only
    # tested the RESID barrier against re-inlining of the zip_with —
    # the encode-under-join re-evaluation is a different (and the
    # dominant) leak.
    coded = resid.select(
        "vec_id",
        "list_id",
        F.expr(_pq_encode_sql(cbr, ksr, col="resid")).alias("codes"),
    ).localCheckpoint(eager=False)
    # driver-side probes + per-(q, list) residual ADC tables: queries
    # and centroids are already driver-held; _pq_l2 is the same
    # left-to-right fold both engines run
    import math

    q_rows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    qtabs = []
    for qr in q_rows:
        qv = [float(x) for x in qr["embedding"]]
        byc = sorted(
            ((_pq_l2(qv, cmap[cid]), cid) for cid in sorted(cmap)),
        )[:IVF_NPROBE]
        for _, cid in byc:
            qres = [a - b for a, b in zip(qv, cmap[cid])]
            t = [
                int(
                    math.floor(
                        _pq_l2(_pq_sub(qres, s), _pq_sub(cbr[k], s)) * PQ_FP
                    )
                )
                for s in range(PQ_M)
                for k in ksr
            ]
            qtabs.append((int(qr["vec_id"]), int(cid), t))
    qdf = spark.createDataFrame(
        qtabs, "q_id bigint, list_id bigint, t array<bigint>"
    )
    scored = (
        coded.join(F.broadcast(qdf), "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(
                f"aggregate(transform(codes, (c, s) -> t[s * {len(ksr)} + c]),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("adc_fp"),
        )
    )
    shortlist = _adc_shortlist(scored)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    reranked = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            "adc_fp",
            _l2sq(F.col("q_emb"), F.col("embedding")).alias("d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    return (
        reranked.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "q_id", "vec_id", "adc_fp", "d2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_SQL_RESID = (
    "list_transform(range(1, 65),"
    " i -> CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
)

_IVFPQ_RESIDUAL_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {IVF_NLIST}
), assigned AS (
  SELECT vec_id, centroid_id AS list_id
  FROM (SELECT e.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="e.embedding", b="c.c_emb")},
                          c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1
), resid AS (
  SELECT e.vec_id, a.list_id,
         {_SQL_RESID.format(v="e.embedding", c="c.c_emb")} AS r
  FROM embeddings e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cent c ON c.centroid_id = a.list_id
), sub AS (
  SELECT vec_id, list_id, s,
         r[s * {PQ_SUBDIM} + 1 : s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM resid, UNNEST(range(0, {PQ_M})) AS t(s)
), cbi AS (
  SELECT s, sv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS j
  FROM sub WHERE vec_id < {PQ_K}
), encoded AS (
  SELECT vec_id, list_id, s, j AS code FROM (
    SELECT v.vec_id, v.list_id, v.s, c.j,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY {_SQL_L2SQ.format(a="v.sv", b="c.sv")}, c.j) AS rn
    FROM sub v JOIN cbi c ON v.s = c.s)
  WHERE rn = 1
), probes AS (
  SELECT q_id, list_id
  FROM (SELECT q.vec_id AS q_id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_SQL_L2SQ.format(a="q.embedding", b="c.c_emb")},
                          c.centroid_id) AS pr
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < {N_QUERIES})
  WHERE pr <= {IVF_NPROBE}
), qres AS (
  SELECT p.q_id, p.list_id,
         {_SQL_RESID.format(v="q.embedding", c="c.c_emb")} AS r
  FROM probes p
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN cent c ON c.centroid_id = p.list_id
), qsub AS (
  SELECT q_id, list_id, s,
         r[s * {PQ_SUBDIM} + 1 : s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM qres, UNNEST(range(0, {PQ_M})) AS t(s)
), qtab AS (
  SELECT q.q_id, q.list_id, q.s, c.j,
         CAST(floor({_SQL_L2SQ.format(a="q.sv", b="c.sv")} * {PQ_FP})
              AS BIGINT) AS dfp
  FROM qsub q JOIN cbi c ON q.s = c.s
), adc AS (
  SELECT t.q_id, e.vec_id, SUM(t.dfp) AS adc_fp
  FROM encoded e
  JOIN qtab t ON t.list_id = e.list_id AND t.s = e.s AND t.j = e.code
  WHERE e.vec_id <> t.q_id
  GROUP BY t.q_id, e.vec_id
), shortlist AS (
  SELECT q_id, vec_id, adc_fp FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY adc_fp, vec_id) AS srnk
    FROM adc)
  WHERE srnk <= {PQ_SHORTLIST}
), reranked AS (
  SELECT s.q_id, s.vec_id, CAST(s.adc_fp AS BIGINT) AS adc_fp,
         {_SQL_L2SQ.format(a='q.embedding', b='b.embedding')} AS d2
  FROM shortlist s
  JOIN embeddings b ON b.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = s.q_id
)
SELECT q_id, vec_id, adc_fp, d2, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY d2, vec_id) AS rnk
      FROM reranked)
WHERE rnk <= {TOP_K}
"""


def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the production IVF+PQ path vs the exact
    answer — the query-set counterpart of ann_knn_graph_recall
    (round 9), closing the PQ family's pricing: cost curves live in
    SCALING.md (linear through 4.8 M vectors once the coded-index
    barrier landed), and THIS entry makes the quality side
    oracle-gated data that re-prices automatically if NLIST/NPROBE/
    PQ_M or the shortlist ever change. The exact side ranks by the
    same metric the IVFPQ refine step uses (L2, ties by neighbor id),
    NOT cosine — recall against a different metric would
    under-report. Losses decompose into the two knobs the plan
    exposes: coarse pruning (true neighbor outside the {IVF_NPROBE}
    probed lists) and quantized shortlisting (inside a probed list
    but ADC-ranked below the {PQ_SHORTLIST}-candidate shortlist).
    Same recall-report shape as ann_recall_audit (q_id, k, n_hit,
    recall); the exact pass costs one |corpus| × {N_QUERIES} scored
    scan against the broadcast panel plus a top-{TOP_K} pick (round-10
    ADVICE fix: the scan is map-only, the pick is not — it is a rank
    window, which Spark 4.1 plans with a map-side partial
    WindowGroupLimit, so the per-query sort is over task-local
    survivors, not the corpus) — one brute-force scan at any SF, by
    design."""
    approx = ann_topk_ivfpq(spark, sf_dir).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _l2sq(F.col("q_emb"), F.col("embedding")).alias("d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    exact = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id")
    )
    return (
        exact.join(approx, ["q_id", "vec_id"], "left_outer")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).alias(
                "n_hit"
            ),
        )
        .select(
            "q_id",
            "k",
            "n_hit",
            (
                F.col("n_hit").cast("double") / F.col("k").cast("double")
            ).alias("recall"),
        )
    )


_IVFPQ_RECALL_SQL = f"""
WITH ap AS ({_IVFPQ_SQL}),
exq AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
ex AS (
  SELECT q_id, vec_id
  FROM (SELECT q_id, b.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q_id
                 ORDER BY {_SQL_L2SQ.format(a="q_emb", b="b.embedding")},
                          b.vec_id) AS rn
        FROM exq JOIN embeddings b ON b.vec_id <> q_id)
  WHERE rn <= {TOP_K}
)
SELECT ex.q_id, COUNT(*) AS k,
       CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ex LEFT JOIN ap ON ap.q_id = ex.q_id AND ap.vec_id = ex.vec_id
GROUP BY ex.q_id
"""


TRUNC_DIMS = 32


def emb_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: how much top-k retrieval
    quality survives if the index stores only the first TRUNC_DIMS of
    each embedding (a 2× index-size/bandwidth cut — the question every
    MRL-trained embedding deployment asks before truncating). Per
    query: overlap between the exact full-dim top-5 and the
    truncated-dim top-5, both ranked in one scan (two windows over the
    same scored pairs). Offline-audit cost profile — the same |Q|·N
    scan as the brute-force baseline, run once per candidate dim, not
    per search."""
    # both the full-dim and the truncated norms — AND the truncated
    # slice itself — are hoisted to per-row columns below the pair join
    # (round 10, `_dot_cos_pre`): same folds over the same (sliced)
    # arrays — bit-identical — evaluated/allocated once per row instead
    # of once per pair; this entry folded FOUR norms and cut TWO array
    # slices per pair inline
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.slice(F.col("embedding"), 1, TRUNC_DIMS).alias("temb"),
        _norm(F.col("embedding")).alias("nrm"),
        _norm(F.slice(F.col("embedding"), 1, TRUNC_DIMS)).alias("tnrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("temb").alias("qt_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("tnrm").alias("q_tnrm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cf"),
            _dot_cos_pre(
                F.col("qt_emb"),
                F.col("temb"),
                F.col("q_tnrm"),
                F.col("tnrm"),
            ).alias("ct"),
        )
    )
    # both top-k picks in one pass over one salted exchange (round 10)
    ranked = two_phase_rank_dual(
        scored,
        (F.desc("cf"), F.asc("vec_id")),
        (F.desc("ct"), F.asc("vec_id")),
        TOP_K,
    )
    return (
        ranked.groupBy("q_id")
        .agg(
            F.sum(
                (F.col("in_a") & F.col("in_b")).cast("long")
            ).alias("n_overlap")
        )
        .select(
            "q_id",
            F.lit(TOP_K).alias("k"),
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.lit(float(TOP_K))).alias(
                "overlap_frac"
            ),
        )
    )


def _trunc_cos_sql(d: int) -> str:
    return f"""(
  list_reduce(list_transform(range(1, {d + 1}),
    i -> CAST(q_emb[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
    (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(q_emb[1:{d}],
       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(b.embedding[1:{d}],
       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))
)"""


_TRUNC_AUDIT_SQL = f"""
WITH queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, b.vec_id AS vec_id,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cf,
         {_trunc_cos_sql(TRUNC_DIMS)} AS ct
  FROM queries JOIN embeddings b ON b.vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cf DESC, vec_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ct DESC, vec_id) AS rt
  FROM scored
)
SELECT q_id, {TOP_K} AS k,
       CAST(SUM(CASE WHEN rf <= {TOP_K} AND rt <= {TOP_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN rf <= {TOP_K} AND rt <= {TOP_K} THEN 1 ELSE 0 END)
            AS DOUBLE) / {float(TOP_K)} AS overlap_frac
FROM ranked GROUP BY q_id
"""


# ---------------------------------------------------------------------------
# k-NN label classification over the corpus graph
# ---------------------------------------------------------------------------


def emb_label_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification — the standard label-transfer /
    label-noise audit for embedding corpora (does a vector's
    neighborhood agree with its own label?): every vector is classified
    by the majority label of its `ann_knn_graph` top-{KNN_GRAPH_K}
    neighbors (ties → smaller label, deterministic) and the per-label
    accuracy lands as a 10-row certificate. High-disagreement labels
    mark annotation noise or genuinely overlapping classes — the
    relabel/merge decision as data.

    Scale: inherits the knn graph's occupancy-capped build; after it,
    everything is edge-list-sized — one (dst, label) join, one
    (src, nlabel) count, one |labels|-row summary. The corpus embedding
    payload is never touched again."""
    from blog_snapshotbackup_azuredatalake_spark.operators.graph import (
        knn_edges_cached,
    )

    labels = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label")
    )
    knn = knn_edges_cached(spark, sf_dir)
    votes = knn.join(
        labels.select(
            F.col("vec_id").alias("dst"), F.col("label").alias("nlabel")
        ),
        "dst",
    )
    counts = votes.groupBy("src", "nlabel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("nlabel"))
    pred = (
        counts.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("src", F.col("nlabel").alias("predicted"))
    )
    joined = pred.join(
        labels.select(
            F.col("vec_id").alias("src"), F.col("label").alias("true_label")
        ),
        "src",
    )
    return (
        joined.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                (F.col("predicted") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "true_label",
            "n_vectors",
            "n_correct",
            (
                F.col("n_correct").cast("double") / F.col("n_vectors")
            ).alias("accuracy"),
        )
    )


_KNN_CLASSIFY_SQL = f"""
WITH knn AS ({_ANN_KNN_GRAPH_SQL}),
labels AS (SELECT vec_id, CAST(label AS INT) AS label FROM embeddings),
votes AS (
  SELECT k.src, e.label AS nlabel
  FROM knn k JOIN labels e ON e.vec_id = k.dst
),
counts AS (SELECT src, nlabel, COUNT(*) AS cnt FROM votes
           GROUP BY src, nlabel),
pred AS (
  SELECT src, nlabel AS predicted
  FROM (SELECT src, nlabel,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cnt DESC, nlabel) AS rn
        FROM counts)
  WHERE rn = 1
),
joined AS (
  SELECT e.label AS true_label, p.predicted
  FROM pred p JOIN labels e ON e.vec_id = p.src
)
SELECT true_label, COUNT(*) AS n_vectors,
       CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
            AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM joined GROUP BY true_label
"""


# ---------------------------------------------------------------------------
# 1-bit (binary sign) quantization audit
# ---------------------------------------------------------------------------

_HAM_HALF = 32  # pack 64 sign bits as two 32-bit halves in BIGINTs —
# shiftleft(1L, 63) wraps differently across engines; two halves keep
# every shift in safe range and cost one extra bit_count


def _pack_bits_expr(col: str, lo_bit: int) -> str:
    """Spark SQL: pack {_HAM_HALF} sign bits of ``col`` starting at
    ``lo_bit`` into one BIGINT (bit i set iff dim lo_bit+i >= 0).
    Emitted as ONE SQL string (SURVEY §6: Py4J per-node cost)."""
    return (
        f"aggregate(transform(sequence(0, {_HAM_HALF - 1}), i -> "
        f"IF(element_at({col}, i + {lo_bit + 1}) >= 0, "
        f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _pack_bits_sql(col: str, lo_bit: int) -> str:
    """DuckDB equivalent of ``_pack_bits_expr`` — list_sum widens to
    HUGEINT, so cast back (SURVEY §4)."""
    return (
        f"CAST(list_sum(list_transform(range(0, {_HAM_HALF}), i -> "
        f"CASE WHEN {col}[i + {lo_bit + 1}] >= 0 "
        f"THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT)"
    )


def emb_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit-per-dim) quantization audit — the 32× compression
    point beyond PQ's 16× (`emb_pq_adc`): each 64-dim float32 vector
    collapses to 64 SIGN BITS (two packed BIGINTs), and candidate
    ranking becomes bit_count(xor) — pure integer ALU work, the cheapest
    possible scan kernel. Per query: overlap between the exact top-
    {TOP_K} by cosine and the top-{TOP_K} by Hamming distance, both
    ranked in ONE |Q|·N scan (two windows over the same scored pairs —
    the `emb_truncation_audit` shape), so the keep-how-many-bits
    decision is oracle-gated data. Packing is map-only engine-side SQL
    (no Python); at index time the packed column is what you'd
    materialize — 16 bytes/vector."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.expr(_pack_bits_expr("embedding", 0)).alias("b_lo"),
        F.expr(_pack_bits_expr("embedding", _HAM_HALF)).alias("b_hi"),
        # per-row norm hoisted below the pair join (round 10,
        # `_dot_cos_pre`): folded once per row, not once per pair
        _norm(F.col("embedding")).alias("nrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("b_lo").alias("q_lo"),
        F.col("b_hi").alias("q_hi"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
            F.expr(
                "bit_count(b_lo ^ q_lo) + bit_count(b_hi ^ q_hi)"
            ).alias("ham"),
        )
    )
    # both top-k picks in one pass over one salted exchange (round 10)
    ranked = two_phase_rank_dual(
        scored,
        (F.desc("cos"), F.asc("vec_id")),
        (F.asc("ham"), F.asc("vec_id")),
        TOP_K,
    )
    return (
        ranked.groupBy("q_id")
        .agg(
            F.sum(
                (F.col("in_a") & F.col("in_b")).cast("long")
            ).alias("n_overlap"),
            F.min(F.when(F.col("in_a"), F.col("ham"))).alias(
                "min_ham_of_true"
            ),
        )
        .select(
            "q_id",
            F.lit(TOP_K).alias("k"),
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.lit(float(TOP_K))).alias(
                "overlap_frac"
            ),
            F.col("min_ham_of_true").cast("int").alias("min_ham_of_true"),
        )
    )


_BINARY_HAMMING_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding,
         {_pack_bits_sql("embedding", 0)} AS b_lo,
         {_pack_bits_sql("embedding", _HAM_HALF)} AS b_hi
  FROM embeddings
), queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb, b_lo AS q_lo, b_hi AS q_hi
  FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, b.vec_id AS vec_id,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cos,
         bit_count(xor(b.b_lo, q_lo)) + bit_count(xor(b.b_hi, q_hi)) AS ham
  FROM queries JOIN emb b ON b.vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, ham,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rc,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id) AS rh
  FROM scored
)
SELECT q_id, {TOP_K} AS k,
       CAST(SUM(CASE WHEN rc <= {TOP_K} AND rh <= {TOP_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN rc <= {TOP_K} AND rh <= {TOP_K} THEN 1 ELSE 0 END)
            AS BIGINT) / CAST({TOP_K} AS DOUBLE) AS overlap_frac,
       CAST(MIN(CASE WHEN rc <= {TOP_K} THEN ham END) AS INT)
         AS min_ham_of_true
FROM ranked GROUP BY q_id
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization audit
# ---------------------------------------------------------------------------

SQ8_DIMS = 64


def emb_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit — the 4× compression point
    completing the shipped family (PQ 16×: `emb_pq_adc`; binary 32×:
    `emb_binary_hamming`): each dim is affinely mapped to [0, 255] by
    per-dim corpus min/max (the faiss ScalarQuantizer QT_8bit recipe),
    and retrieval quality is measured as per-query overlap of the exact
    cosine top-{TOP_K} vs the top-{TOP_K} against RECONSTRUCTED corpus
    vectors (queries stay full-precision — the standard asymmetric
    setup). Per-dim stats are a {SQ8_DIMS}-cell aggregate collected to
    the driver (bounded by construction — the centroid-literal pattern)
    and ride into the scan as literals, so quantize+reconstruct is
    MAP-ONLY; the oracle recomputes identical stats from the data."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    stats = sorted(
        emb.select(
            F.posexplode("embedding").alias("i", "x")
        )
        .groupBy("i")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect(),
        key=lambda r: r["i"],
    )
    mn_lit = F.array(*[F.lit(float(r["mn"])) for r in stats])
    mx_lit = F.array(*[F.lit(float(r["mx"])) for r in stats])

    def _recon(i: F.Column) -> F.Column:
        x = F.element_at(F.col("embedding"), i).cast("double")
        mn = F.element_at(F.col("mn_arr"), i)
        mx = F.element_at(F.col("mx_arr"), i)
        q = F.floor((x - mn) * 255 / (mx - mn) + 0.5)
        return F.when(mx == mn, mn).otherwise(mn + q * (mx - mn) / 255.0)

    recon = emb.withColumn("mn_arr", mn_lit).withColumn(
        "mx_arr", mx_lit
    ).select(
        "vec_id",
        "embedding",
        F.transform(
            F.sequence(F.lit(1), F.lit(len(stats))), _recon
        ).alias("rembedding"),
    )
    # per-row norms (exact AND reconstructed) hoisted below the pair
    # join (round 10, `_dot_cos_pre`): this entry folded FOUR norms per
    # pair inline — including a norm over the derived rembedding, whose
    # reconstruction transform the fold re-walked per pair — so the
    # hoist removes 2/3 of its interpreted per-pair work. Separate
    # select above `recon` so r_nrm references the named rembedding
    # column rather than inlining the transform a second time.
    recon = recon.select(
        "vec_id",
        "embedding",
        "rembedding",
        _norm(F.col("embedding")).alias("e_nrm"),
        _norm(F.col("rembedding")).alias("r_nrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    scored = (
        recon.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("e_nrm"),
            ).alias("cx"),
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("rembedding"),
                F.col("q_nrm"),
                F.col("r_nrm"),
            ).alias("cr"),
        )
    )
    # round 10: the two_phase_rank_dual rewrite its siblings took
    # (emb_truncation_audit 2.85×, emb_binary_hamming 4.0× at sf60de)
    # was measured SLOWER here in two independent fresh-session
    # min-of-N pairs at sf60de (31.8 s plain vs 52.5 s dual; first
    # pair 54.3 vs 89.7 — ~1.6× both times), so per the
    # measurement-decides rule the original two-window form stays.
    # Mechanism attributed by the norm-hoist A/B (this round, below):
    # the per-pair cost was dominated by the four interpreted norm
    # folds — one over the derived rembedding — which the dual rewrite
    # never touched while adding its exchange.
    wx = Window.partitionBy("q_id").orderBy(F.desc("cx"), F.asc("vec_id"))
    wr = Window.partitionBy("q_id").orderBy(F.desc("cr"), F.asc("vec_id"))
    ranked = scored.withColumn("rx", F.row_number().over(wx)).withColumn(
        "rr", F.row_number().over(wr)
    )
    return (
        ranked.groupBy("q_id")
        .agg(
            F.sum(
                ((F.col("rx") <= TOP_K) & (F.col("rr") <= TOP_K)).cast("long")
            ).alias("n_overlap")
        )
        .select(
            "q_id",
            F.lit(TOP_K).alias("k"),
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.lit(float(TOP_K))).alias(
                "overlap_frac"
            ),
        )
    )


_SQ8_SQL = f"""
WITH dims AS (
  SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
         MAX(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM embeddings, range(1, {SQ8_DIMS + 1}) t(i)
  GROUP BY i
),
cells AS (
  SELECT vec_id, i,
         CASE WHEN mx = mn THEN mn
              ELSE mn + floor((CAST(embedding[i] AS DOUBLE) - mn) * 255
                              / (mx - mn) + 0.5) * (mx - mn) / 255.0
         END AS r
  FROM embeddings JOIN dims ON TRUE
),
recon AS (
  SELECT vec_id, list(r ORDER BY i) AS rembedding
  FROM cells GROUP BY vec_id
),
queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q_id, b.vec_id AS vec_id,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cx,
         (
  list_reduce(list_transform(range(1, 1 + len(q_emb)),
    i -> CAST(q_emb[i] AS DOUBLE) * r.rembedding[i]),
    (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(q_emb,
       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(r.rembedding,
       v -> v * v), (x, y) -> x + y)))
) AS cr
  FROM queries
  JOIN embeddings b ON b.vec_id <> q_id
  JOIN recon r ON r.vec_id = b.vec_id
),
ranked AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cx DESC, vec_id) AS rx,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cr DESC, vec_id) AS rr
  FROM scored
)
SELECT q_id, {TOP_K} AS k,
       CAST(SUM(CASE WHEN rx <= {TOP_K} AND rr <= {TOP_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN rx <= {TOP_K} AND rr <= {TOP_K} THEN 1 ELSE 0 END)
            AS BIGINT) / CAST({TOP_K} AS DOUBLE) AS overlap_frac
FROM ranked GROUP BY q_id
"""


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall certificate for the scale ANN path: how many of
    the exact brute-force top-{TOP_K} the map-only IVF search actually
    returned — recall@{TOP_K} as DATA, per query, driver-checked. This
    promotes the repo's headline ANN quality claim (recall ≈ 0.87 at
    sf0.1, scripts/ann_quality.py) from a script readout to an
    oracle-gated operator: both sides are the deployed operators
    themselves, joined on (q_id, vec_id). Cost is the two searches plus
    a query-set-sized join — the brute-force side is the labeled audit
    companion, bounded by the broadcast query set exactly as
    ann_topk_bruteforce documents."""
    exact = ann_topk_bruteforce(spark, sf_dir).select("q_id", "vec_id")
    approx = ann_topk_ivf(spark, sf_dir).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["q_id", "vec_id"], "left_outer")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).alias(
                "n_hit"
            ),
        )
        .select(
            "q_id",
            "k",
            "n_hit",
            (
                F.col("n_hit").cast("double") / F.col("k").cast("double")
            ).alias("recall"),
        )
    )


_ANN_RECALL_SQL = f"""
WITH ex AS ({_ANN_BRUTE_SQL}),
ap AS ({_ANN_IVF_SQL})
SELECT ex.q_id, COUNT(*) AS k,
       CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
GROUP BY ex.q_id
"""


# ---------------------------------------------------------------------------
# cosine range search (all neighbors above a similarity floor)
# ---------------------------------------------------------------------------

RANGE_TAU = 0.3  # data-informed: the driver corpus is near-orthogonal
# random vectors (max query cosine ≈ 0.5); with planted-dup embeddings
# the same plan runs at 0.9+


def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query over the embedding space: EVERY corpus vector with
    cosine ≥ {RANGE_TAU} to each query — the retrieval shape where the
    answer size is data-dependent (near-dup sweeps, wiki-linking,
    dedup-by-query), versus top-k's fixed k. Candidates come from the
    same multi-probe sign-LSH blocking as ``ann_topk_lsh`` (own bucket
    + Hamming-1 probes, query side broadcast, corpus scanned in place),
    then the exact cosine filter keeps qualifying pairs. The oracle
    mirrors the blocking, so recall is part of the verified contract,
    not a hidden property — same policy as dedup_embedding. A missing
    candidate is a τ-close vector that disagrees on ≥2 hyperplane
    signs — rarer the higher the cosine, because similar vectors agree
    on most signs (the LSH guarantee)."""
    # PARTIAL norm hoist — same selective-bucket-join argument as
    # ann_topk_lsh (the full corpus-side hoist regressed there; see
    # that entry's comment): q_nrm rides the probe side, the corpus
    # norm stays inline on matched pairs only.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _sign_bucket(F.col("embedding"), LSH_DIMS).alias("bucket"),
    )
    base_q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    flip = F.expr(
        "CASE WHEN i = 0 THEN bucket ELSE concat(substring(bucket, 1, i - 1),"
        " CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END,"
        f" substring(bucket, i + 1, {LSH_DIMS})) END"
    )
    queries = base_q.select(
        "q_id",
        "q_emb",
        "q_nrm",
        "bucket",
        F.explode_outer(F.sequence(F.lit(0), F.lit(LSH_DIMS))).alias("i"),
    ).select("q_id", "q_emb", "q_nrm", flip.alias("bucket"))
    return (
        emb.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                _norm(F.col("embedding")),
            ).alias("cos"),
        )
        # round 10: `.distinct()` removed — same no-op-dedup argument
        # as ann_topk_lsh (one bucket per vector, pairwise-distinct
        # probe buckets per query ⇒ no (q_id, vec_id) dup can exist;
        # tests/test_lsh_probe_uniqueness.py). The entry is now
        # map-only end to end: broadcast probe join + filter, ZERO
        # exchanges of the corpus-sized scored relation (guide §2.4).
        .filter(F.col("cos") >= RANGE_TAU)
    )


_ANN_RANGE_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding, {_LSH_BUCKET} AS bucket FROM embeddings
), base_q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM emb
  WHERE vec_id < {N_QUERIES}
), queries AS (
  SELECT q_id, q_emb,
         CASE WHEN i = 0 THEN bucket
              ELSE substr(bucket, 1, CAST(i - 1 AS INT))
                   || (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
                            THEN '0' ELSE '1' END)
                   || substr(bucket, CAST(i + 1 AS INT), {LSH_DIMS})
         END AS bucket
  FROM base_q, range(0, {LSH_DIMS + 1}) t(i)
), pairs AS (
  SELECT DISTINCT q_id, b.vec_id AS vec_id, {_SQL_COS.replace("a.embedding", "q_emb").replace("b.embedding", "b.embedding")} AS cos
  FROM queries JOIN emb b USING (bucket)
  WHERE b.vec_id <> q_id
)
SELECT q_id, vec_id, cos FROM pairs WHERE cos >= {RANGE_TAU}
"""


# ---------------------------------------------------------------------------
# MMR diversified retrieval
# ---------------------------------------------------------------------------

MMR_SHORTLIST = 16
MMR_K = 5
MMR_LAMBDA = 0.7


def _mmr_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-query candidate shortlist for MMR (broadcast query
    side + rank window — the ann_topk_bruteforce plan). Factored out so
    the test can replay the greedy loop in pure Python on the SAME
    Spark-computed relevance values."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        # per-row norm hoisted below the pair join (round 10,
        # `_dot_cos_pre`): folded once per row, not once per pair
        _norm(F.col("embedding")).alias("nrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_emb",
            "vec_id",
            "embedding",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("rel"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("vec_id"))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= MMR_SHORTLIST
    )


def emb_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k: after exact
    retrieval of a {MMR_SHORTLIST}-candidate shortlist per query, pick
    {MMR_K} results greedily maximizing λ·sim(q,d) − (1−λ)·max
    sim(d, already-picked) — the standard redundancy-suppressing
    re-rank for retrieval-augmented training-data selection (don't
    feed the model 5 copies of the same paragraph). The greedy loop is
    inherently sequential, but only WITHIN a query over ≤{MMR_SHORTLIST}
    rows — so it runs as applyInPandas per q_id group (Arrow-batched,
    bounded memory per group by construction) after the distributed
    exact shortlist (broadcast query side, rank window — the
    ann_topk_bruteforce plan). Rows-only entry: the greedy argmax over
    numpy doubles is not expressible as one SQL fold; the pytest
    reimplements MMR in pure Python on the oracle-verified brute-force
    shortlist and the outputs must agree exactly."""
    shortlist = _mmr_shortlist(spark, sf_dir)

    lam = MMR_LAMBDA

    def mmr(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["rel", "vec_id"], ascending=[False, True])
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["rel"].to_numpy()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T  # shortlist × shortlist, ≤ 16×16
        chosen: list[int] = []
        penalties: list[float] = []
        avail = list(range(len(ids)))
        for _ in range(min(MMR_K, len(ids))):
            best, best_score, best_pen = None, None, 0.0
            for i in avail:
                pen = max((sims[i, j] for j in chosen), default=0.0)
                score = lam * rel[i] - (1.0 - lam) * pen
                # deterministic: strict improvement, ties to smaller id
                if best is None or score > best_score or (
                    score == best_score and ids[i] < ids[best]
                ):
                    best, best_score, best_pen = i, score, pen
            chosen.append(best)
            penalties.append(best_pen)
            avail.remove(best)
        return pd.DataFrame(
            {
                "q_id": pdf["q_id"].iloc[:1].repeat(len(chosen)).to_numpy(),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "vec_id": ids[chosen],
                "relevance": rel[chosen],
                "diversity_penalty": np.array(penalties),
            }
        )

    return shortlist.groupBy("q_id").applyInPandas(
        mmr,
        "q_id long, mmr_rank int, vec_id long, relevance double,"
        " diversity_penalty double",
    )


HARD_NEG_K = 5


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each of the
    first {N_QUERIES} query vectors, the {HARD_NEG_K} most-similar
    vectors with a DIFFERENT label (the negatives a triplet loss
    learns most from), plus the query's best same-label positive and
    the triplet margin (cos_pos − cos_neg; negative margin ⇒ the
    negative out-scores every positive — a label-noise signal).

    Plan: corpus × broadcast 20-query panel (map-only, linear), one
    per-query top-k window (Spark 4 WindowGroupLimit keeps it
    per-partition) and one max_by-style agg for the positive; margin is
    a subtraction of identically-computed doubles, so it is
    bit-portable across engines (SURVEY §4). At 100 TB the scorer
    swaps to the IVF shortlist exactly as ann_recall_audit composes
    it; the contract (per-query top-k with label exclusion) is
    unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        "label",
        # per-row norm hoisted below the pair join (round 10,
        # `_dot_cos_pre`): folded once per row, not once per pair
        _norm(F.col("embedding")).alias("nrm"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            _dot_cos_pre(
                F.col("q_emb"),
                F.col("embedding"),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos"),
        )
    )
    # round 10: `pairs` used to feed the negatives window AND a
    # separate positives max-aggregate, and each DataFrame reference
    # plans its OWN subtree — the committed before-plan
    # (plans/r10/emb_hard_negatives_before.txt) shows the corpus-sized
    # BroadcastNestedLoopJoin + cosine chain TWICE (the
    # ann_knn_graph_recall disease). One window partitioned by
    # (q_id, is_pos) ranks positives and negatives in the same pass —
    # rank-1 positive cos IS max(cos) over positives (same desc order,
    # ties only tie on cos) — with the rank-limit filter keeping
    # WindowGroupLimit(Partial) in play; the ≤ |Q|·2·K survivors are
    # checkpoint-barriered so deriving both sides plans the brute
    # chain once (guide §1.2).
    w2 = Window.partitionBy(
        "q_id", F.col("label") == F.col("q_label")
    ).orderBy(F.col("cos").desc(), F.col("vec_id"))
    survivors = (
        pairs.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= HARD_NEG_K)
        .select("q_id", "q_label", "vec_id", "label", "cos", "rnk")
        .localCheckpoint(eager=False)
    )
    pos = (
        survivors.filter(
            (F.col("label") == F.col("q_label")) & (F.col("rnk") == 1)
        )
        .select("q_id", F.col("cos").alias("cos_pos"))
    )
    negs = survivors.filter(F.col("label") != F.col("q_label"))
    return negs.join(pos, "q_id", "left").select(
        "q_id",
        F.col("vec_id").alias("neg_id"),
        F.col("cos").alias("cos_neg"),
        F.col("rnk").cast("int").alias("rnk"),
        "cos_pos",
        (F.col("cos_pos") - F.col("cos")).alias("margin"),
    )


_HARD_NEG_SQL = f"""
WITH queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id < {N_QUERIES}
), pairs AS (
  SELECT q_id, q_label, b.vec_id AS vec_id, b.label AS label,
         {_SQL_COS.replace("a.embedding", "q_emb")} AS cos
  FROM queries JOIN embeddings b ON b.vec_id <> q_id
), pos AS (
  SELECT q_id, MAX(cos) AS cos_pos FROM pairs
  WHERE label = q_label GROUP BY q_id
), negs AS (
  SELECT q_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, vec_id) AS INT)
           AS rnk
  FROM pairs WHERE label <> q_label
  QUALIFY rnk <= {HARD_NEG_K}
)
SELECT n.q_id, n.vec_id AS neg_id, n.cos AS cos_neg, n.rnk,
       p.cos_pos, p.cos_pos - n.cos AS margin
FROM negs n LEFT JOIN pos p USING (q_id)
"""


# ---------------------------------------------------------------------------
# random-pair cosine calibration (SemDeDup / dedup threshold grounding)
# ---------------------------------------------------------------------------

CAL_PAIR_MOD = 4  # hash gate: expected 1/4 of vectors enter the sample
CAL_PAIR_CAP = 1024  # hard cap on sampled vectors (512 pairs)
CAL_COS_BUCKETS = 20  # histogram over [-1, 1] in 0.1 steps


def emb_pair_cosine_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-distribution calibration for every cosine threshold in the
    repo (SemDeDup is_dup, ann_range_search radius, knn edges): cosine
    of ~{CAL_PAIR_CAP}/2 pseudo-random vector pairs, histogrammed over
    [-1, 1] in {CAL_COS_BUCKETS} buckets. A threshold is meaningful
    only relative to this background mass — if τ=0.92 sits above the
    histogram's support, near-dup hits at 0.92 are signal, not chance.

    Sampling is the audit-scale pattern of dedup_anchor_calibration:
    a stateless md5 gate (keeps ~1/{CAL_PAIR_MOD} of vectors, pure map
    filter, pushdown-friendly) followed by a HARD cap of
    {CAL_PAIR_CAP} — the only global sort ever sees the gated sample
    and the window is bounded by the cap, so cost is O(1) in corpus
    size at any SF. Pairing is lead() over the capped md5 order
    (consecutive ranks — md5 order decorrelates ids, so pairs are
    effectively random); cosine is the shared bit-identical double
    fold (`_dot_cos` ↔ `_sql_cos`)."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    gated = vecs.filter(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % CAL_PAIR_MOD == 0
    ).select(
        "vec_id",
        "embedding",
        F.md5(F.col("vec_id").cast("string")).alias("h"),
    )
    # round 10: the partition-less cap window ranked the whole
    # md5-gated sample — corpus/CAL_PAIR_MOD rows CARRYING THE
    # EMBEDDING ARRAYS — in ONE task (k = 1024 > the rank-limit
    # pushdown threshold, so no WindowGroupLimit). Restructured as
    # orderBy+limit on the NARROW (vec_id, h) projection — planned as
    # TakeOrderedAndProject: each map task keeps its local top-1024,
    # no full exchange, and no array ever enters a sort — then the
    # ≤ CAL_PAIR_CAP picked ids broadcast-join their embeddings back.
    # (A salted two_phase_rank here was measured SLOWER at sf60de,
    # 2.4 → 7.4 s: it shipped the arrays through two exchanges.)
    # The pairing windows below stay global but run over
    # ≤ CAL_PAIR_CAP rows — bounded by constant, fine.
    picked = (
        gated.select("vec_id", "h")
        .orderBy("h", "vec_id")
        .limit(CAL_PAIR_CAP)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("h", "vec_id"))
        )
        .select("vec_id", "rn")
    )
    sample = (
        F.broadcast(picked)
        .join(vecs, "vec_id")
        .select("vec_id", "embedding", "rn")
    )
    paired = sample.select(
        "rn",
        "vec_id",
        "embedding",
        F.lead("vec_id").over(Window.orderBy("rn")).alias("b_id"),
        F.lead("embedding").over(Window.orderBy("rn")).alias("b_emb"),
    ).filter((F.col("rn") % 2 == 1) & F.col("b_id").isNotNull())
    cos = _dot_cos(F.col("embedding"), F.col("b_emb"))
    bucketed = paired.select(
        F.least(
            F.floor((cos + 1.0) / 0.1).cast("int"),
            F.lit(CAL_COS_BUCKETS - 1),
        ).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "bucket",
            (F.col("bucket") * 0.1 - 1.0).alias("cos_lo"),
            "n_pairs",
        )
    )


_CAL_PAIR_SQL = f"""
WITH gated AS (
  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS h
  FROM embeddings
  WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
             AS BIGINT) % {CAL_PAIR_MOD} = 0
), sample AS (
  SELECT vec_id, embedding,
         ROW_NUMBER() OVER (ORDER BY h, vec_id) AS rn
  FROM gated
  QUALIFY rn <= {CAL_PAIR_CAP}
), paired AS (
  SELECT rn, embedding AS a_emb,
         LEAD(vec_id) OVER (ORDER BY rn) AS b_id,
         LEAD(embedding) OVER (ORDER BY rn) AS b_emb
  FROM sample
  QUALIFY rn % 2 = 1 AND b_id IS NOT NULL
), buckets AS (
  SELECT LEAST(CAST(FLOOR(({_sql_cos("a_emb", "b_emb")} + 1.0) / 0.1)
                    AS INT), {CAL_COS_BUCKETS - 1}) AS bucket
  FROM paired
)
SELECT bucket, bucket * 0.1e0 - 1.0e0 AS cos_lo,
       COUNT(*) AS n_pairs
FROM buckets GROUP BY bucket
"""


def _ann_knn_graph_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for ann_knn_graph, served from the session graph
    cache: the LSH-bucketed self-join build is the priciest substrate
    in the family (66 s of the round-7 sf10 suite) and
    emb_label_knn_classify / graph_pagerank / graph_link_predict /
    graph_clustering_coefficient all consume it — one materialization,
    many riders (the dedup-substrate recipe)."""
    from blog_snapshotbackup_azuredatalake_spark.operators.graph import (
        knn_graph_cached,
    )

    return knn_graph_cached(spark, sf_dir)


QUERIES = {
    "emb_hard_negatives": emb_hard_negatives,
    "emb_pair_cosine_calibration": emb_pair_cosine_calibration,
    "ann_hybrid_rrf": ann_hybrid_rrf,
    "ann_range_search": ann_range_search,
    "emb_label_knn_classify": emb_label_knn_classify,
    "emb_binary_hamming": emb_binary_hamming,
    "emb_quantize_sq8": emb_quantize_sq8,
    "ann_filtered_search": ann_filtered_search,
    "emb_mmr_diversify": emb_mmr_diversify,
    "ann_recall_audit": ann_recall_audit,
    "emb_truncation_audit": emb_truncation_audit,
    "emb_pq_adc": emb_pq_adc,
    "ann_topk_ivfpq": ann_topk_ivfpq,
    "ann_topk_ivfpq_residual": ann_topk_ivfpq_residual,
    "ann_ivfpq_recall": ann_ivfpq_recall,
    "ann_index_balance": ann_index_balance,
    "ann_ivf_upsert": ann_ivf_upsert,
    "emb_pq_residual_audit": emb_pq_residual_audit,
    "ann_nprobe_curve": ann_nprobe_curve,
    "ann_knn_graph": _ann_knn_graph_cached,
    "ann_knn_graph_recall": ann_knn_graph_recall,
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "ann_topk_ivf_trained": ann_topk_ivf_trained,
    "ann_topk_arrow": ann_topk_arrow,
}

ORACLES = {
    "emb_hard_negatives": _HARD_NEG_SQL,
    "emb_pair_cosine_calibration": _CAL_PAIR_SQL,
    "ann_hybrid_rrf": _hybrid_rrf_sql(),
    "ann_range_search": _ANN_RANGE_SQL,
    "emb_label_knn_classify": _KNN_CLASSIFY_SQL,
    "emb_binary_hamming": _BINARY_HAMMING_SQL,
    "emb_quantize_sq8": _SQ8_SQL,
    "ann_filtered_search": _ANN_FILTERED_SQL,
    # emb_mmr_diversify: rows-only — greedy numpy argmax ≠ SQL fold
    "ann_recall_audit": _ANN_RECALL_SQL,
    "emb_truncation_audit": _TRUNC_AUDIT_SQL,
    "emb_pq_adc": _PQ_ADC_SQL,
    "ann_topk_ivfpq": _IVFPQ_SQL,
    "ann_topk_ivfpq_residual": _IVFPQ_RESIDUAL_SQL,
    "ann_ivfpq_recall": _IVFPQ_RECALL_SQL,
    "ann_index_balance": _INDEX_BALANCE_SQL,
    "ann_ivf_upsert": _IVF_UPSERT_SQL,
    "emb_pq_residual_audit": _PQ_RESIDUAL_SQL,
    "ann_nprobe_curve": _nprobe_curve_sql(),
    "ann_knn_graph": _ANN_KNN_GRAPH_SQL,
    "ann_knn_graph_recall": _ANN_KNN_RECALL_SQL,
    "ann_topk_bruteforce": _ANN_BRUTE_SQL,
    "ann_topk_lsh": _ANN_LSH_SQL,
    "ann_topk_ivf": _ANN_IVF_SQL,
    # ann_topk_arrow: rows-only — numpy fold order ≠ SQL fold order
}
