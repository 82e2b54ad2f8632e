"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table with shifted keys — referential integrity
preserved (fact FKs shift with their dimension PKs), document text
decorrelated per copy so the near-dup clique structure scales linearly
instead of forming cross-copy cliques.

    python scripts/make_sfbig.py [src_dir] [out_dir] [factor]
    # default: /root/testdata/sf0.1 /tmp/sfbig/sf1 10

The fixed dims (region, nation) are not replicated — as in TPC-H, they
don't scale with SF. Queries that select "the first N ids" (ANN query
vectors, IVF seed centroids) keep operating on copy 0, so result shapes
stay comparable across SFs.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

KEY_OFFSET = 1_000_000_000  # per-copy id shift, far above any real key

# table -> columns that carry a scalable entity id (PK or FK)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 4th arg: comma-separated table subset (e.g. a dedup-suite
    # run only needs documents,embeddings — skipping lineitem saves
    # ~15 GB and most of the generation time at factor 600)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from blog_snapshotbackup_azuredatalake_spark.session import get_session
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    spark = get_session("make_sfbig")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for t in FIXED_DIMS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    # one GLOBAL stride above every existing key: a fixed KEY_OFFSET
    # collides when the source is itself a generated dir (copy shifts
    # stack additively — base + 3·OFF + 2·OFF ≡ base + 1·OFF + 4·OFF —
    # which silently duplicated doc_ids in two-stage sf10 builds). The
    # stride must be the SAME for every column so FK pairs
    # (o_custkey ↔ c_custkey) shift in lockstep.
    gmax = 0
    for t, keys in SHIFTS.items():
        # a table-subset source dir (e.g. sf60de = documents+embeddings
        # only) doesn't ship the full star; the stride only has to
        # clear the keys of the tables actually being replicated, and
        # FK-lockstep only matters among those same tables
        if only is not None and t not in only:
            continue
        row = (
            load_table(spark, src, t)
            .agg(*[F.max(k).alias(k) for k in keys])
            .collect()[0]
        )
        gmax = max([gmax] + [v for v in row if v is not None])
    stride = KEY_OFFSET * (gmax // KEY_OFFSET + 1)

    for t, keys in SHIFTS.items():
        if only is not None and t not in only:
            continue
        base = load_table(spark, src, t)
        copies = []
        for i in range(factor):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * stride))
            if t == "documents" and i > 0:
                # tag every TOKEN with the copy id so copy i's
                # shingle/minhash space is disjoint from copy 0's:
                # planted near-dups stay near-dups WITHIN a copy, no
                # cross-copy cliques form. Tagging (suffix on each
                # token) — NOT inserting separator tokens — keeps token
                # count and gram diversity proportional to corpus size;
                # the previous ` v{i} `-insertion halved gram diversity
                # and doubled tokens per generation, which made sf10
                # text degenerate (max gram df 8839 vs 345 at sf3) and
                # faked a super-linear dedup curve.
                df = df.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1{i}"),
                )
            copies.append(df)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        if t == "events":
            # mirror the driver testdata schema: ts as TIMESTAMP(MICROS)
            # (load_table normalizes to bigint nanos in memory; writing
            # that back out would break the DuckDB epoch_ns() oracles)
            full = full.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
        full.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: {factor}x written")


if __name__ == "__main__":
    main()
