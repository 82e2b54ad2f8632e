from blog_snapshotbackup_azuredatalake_spark.functions.hashing import (
    md5_int60,
    row_hash,
    row_hash_int,
)
from blog_snapshotbackup_azuredatalake_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "md5_int60",
    "row_hash",
    "row_hash_int",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
