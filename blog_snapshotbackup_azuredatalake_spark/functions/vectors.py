"""Vector math over ``array<float>`` columns — JVM built-ins only.

``F.zip_with`` + ``F.aggregate`` avoid any Python round-trip per row,
but note they are CodegenFallback in Spark 4.x (interpreted lambda
evaluation, NOT whole-stage codegen) — which is exactly why pair-heavy
scorers hoist row-constant norms out of the per-pair expression
(`_dot_cos_pre` in operators/dedup.py, round 10). Accumulate in double
regardless of the array element type so Spark and DuckDB
(list_dot_product promotes to double) agree bit-for-bit on float32
inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
