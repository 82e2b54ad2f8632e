"""Skew-mitigation utilities: salting and two-phase aggregation.

AQE's skew-join splitting handles most cases at runtime; these are the
explicit tools for the pathologies AQE can't fix — a single hot key in a
shuffle-heavy aggregation, or a join where one key holds a double-digit
percentage of the fact side.

Salt values derive from ``xxhash64`` of the fact row's own columns —
deterministic (same row → same salt on every run/retry, which keeps
speculative execution and task retries consistent) but effectively
uniform. xxhash64 is engine-internal only (SURVEY.md §4): salting never
changes query RESULTS, so it needs no oracle portability.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salt_column(df: DataFrame, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) from all of the row's columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join `facts` ⋈ `dims` on `key`, with the dim side
    replicated n_salt× and the fact side salted, so one hot key spreads
    over n_salt reducers instead of one straggler task.

    Result rows are identical to ``facts.join(dims, key, how)`` — only
    the shuffle distribution changes. Use when a key's share of the fact
    side exceeds what one task should own and the dim side is too big to
    broadcast outright (else just broadcast)."""
    salted_facts = facts.withColumn("_salt", salt_column(facts, n_salt))
    # explode_outer: constant-size sequence, skip the inferred size()>0
    # filter plain explode would add (SURVEY.md §6)
    replicated = dims.withColumn(
        "_salt", F.explode_outer(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_facts.join(replicated, [key, "_salt"], how).drop("_salt")


# Salt width for two-phase top-k rank windows (round 10). A row_number
# window partitioned by a CONSTANT-cardinality key (the 20-query ANN
# panel, a handful of corpus sources) over a data-sized relation bounds
# the sort's parallelism at that cardinality no matter how large the
# corpus or the cluster — measured as 97–150 s warm-run swings at 2.4 M
# vectors from heap churn on a 48 M-row 20-partition ADC sort
# (SCALING.md round 9). Scale-adaptive by env (a cluster run raises it
# with the executor count); the default keeps |parts|·TOPK_SALT ≫ any
# local core count while phase 2 stays trivially small.
TOPK_SALT = int(os.environ.get("SPARK_GRAFT_TOPK_SALT", "64"))


def two_phase_rank(
    df: DataFrame,
    order_cols,
    k: int,
    part_cols=("q_id",),
    salt_col: str = "vec_id",
    rank_name: str = "rnk",
) -> DataFrame:
    """Salted two-phase top-k rank window — exact, not approximate.

    Phase 1 ranks within (part_cols..., pmod(xxhash64(salt_col),
    TOPK_SALT)) — |parts|·TOPK_SALT cells, each sorting ~1/TOPK_SALT of
    the rows — and keeps the top k per cell; phase 2 re-ranks the
    |parts|·TOPK_SALT·k survivors with the original window and filters
    to rank ≤ k.

    Equivalence: ``order_cols`` must end in a tiebreak column unique
    within a partition (every call site uses vec_id / doc_id / tok), so
    the order is total. Any row in the overall top-k of its partition
    under that total order is a fortiori in the top-k of its salt
    cell, so phase 1 never drops a winner, and phase 2 applies the
    identical deterministic order — same rows, same rank values, same
    oracle hash (the salting machinery above applied to a rank window;
    round-9 verdict item 1)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(TOPK_SALT))
    )
    w1 = Window.partitionBy(*part_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_cell_rnk", F.row_number().over(w1))
        .filter(F.col("_cell_rnk") <= k)
        .drop("_cell_rnk", "_salt")
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return survivors.withColumn(
        rank_name, F.row_number().over(w2)
    ).filter(F.col(rank_name) <= k)


def two_phase_rank_dual(
    df: DataFrame,
    order_a,
    order_b,
    k: int,
    part_cols=("q_id",),
    salt_col: str = "vec_id",
    in_a: str = "in_a",
    in_b: str = "in_b",
) -> DataFrame:
    """Two exact top-k picks by DIFFERENT orders over the same
    data-sized relation, sharing ONE salted exchange (round 10).

    The ANN audit entries (truncation / binary-Hamming / SQ8 overlap)
    ran two row_number windows partitioned by q_id over the full
    scored relation: one exchange, but two corpus-sized sorts whose
    parallelism is bounded at |Q| = 20 tasks by contract. Here phase 1
    computes BOTH cell ranks within (part_cols..., salt) — still one
    exchange, now |parts|·TOPK_SALT small sorts per order — and keeps
    only rows in EITHER cell top-k. Phase 2 recovers each order's
    exact global rank as a running count of its qualifying rows over
    the tiny union (≤ 2·k·TOPK_SALT rows per partition), so both final
    picks live on one relation with no plan duplication.

    Returns the union rows with boolean columns ``in_a`` / ``in_b``:
    true ⟺ the row is in the true global top-k under that order.
    Exactness argument as two_phase_rank: orders must end in a
    within-partition-unique tiebreak, every global top-k row is in its
    cell top-k, and ranking among qualifying rows equals the global
    rank because the global top-k only contains qualifying rows."""
    # the salt MUST be a materialized column, not an inline expression:
    # two windows partitioned by separate instances of the same
    # expression plan as two different partition keys — i.e. TWO full
    # exchanges of the corpus-sized input (measured in the round-10
    # plan capture); one shared attribute → one exchange, two sorts
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(TOPK_SALT))
    )
    w1a = Window.partitionBy(*part_cols, "_salt").orderBy(*order_a)
    w1b = Window.partitionBy(*part_cols, "_salt").orderBy(*order_b)
    pre = (
        salted.withColumn("_ca", F.row_number().over(w1a))
        .withColumn("_cb", F.row_number().over(w1b))
        .filter((F.col("_ca") <= k) | (F.col("_cb") <= k))
        .drop("_salt")
    )
    w2a = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_a)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2b = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pre.withColumn(
            "_ga",
            F.sum(F.when(F.col("_ca") <= k, 1).otherwise(0)).over(w2a),
        )
        .withColumn(
            "_gb",
            F.sum(F.when(F.col("_cb") <= k, 1).otherwise(0)).over(w2b),
        )
        .withColumn(in_a, (F.col("_ca") <= k) & (F.col("_ga") <= k))
        .withColumn(in_b, (F.col("_cb") <= k) & (F.col("_gb") <= k))
        .drop("_ca", "_cb", "_ga", "_gb")
    )


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    n_salt: int = 16,
) -> DataFrame:
    """Skew-proof sum/count aggregation: partial-aggregate on
    (keys + salt), then final-aggregate on keys. Each output column
    `c` becomes `sum_c`; a `n_rows` count is always included.

    Spark's hash aggregate already map-side combines, so this only wins
    when a hot key floods the merge side too — the salt bounds any one
    reducer's share of a key at 1/n_salt."""
    salted = df.withColumn("_salt", salt_column(df, n_salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
