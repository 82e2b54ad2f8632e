"""Multimodal column plumbing (SURVEY.md §2C, `mm_decode_pipeline`).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the Spark-side
shape a real multimodal pipeline needs (schema, partitioning, batch
processing). The container has no image/audio libraries, so the *decode*
step is a deterministic fake (parses the synthetic header we generate);
it is isolated in ``_decode_payload`` behind ``MM_REAL_DECODE`` so a real
``PIL.Image.open`` / ``soundfile.read`` drops in without touching the
plan. Everything around the stub — binary synthesis, metadata struct,
batch iteration, output schema — is real and tested.

Payload format (synthetic): 12-byte ASCII header (4-digit width, 4-digit
height, 4-char format tag padded with '.'), then 64 md5-keystream bytes.
(ASCII header because Spark strings are UTF-8 — codepoints ≥128 would
become multi-byte sequences and break fixed-offset parsing; a real
pipeline reads true binary from binaryFile/parquet instead.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table

MM_REAL_DECODE = False  # flip when a real decoder library is available

_FORMATS = ["png", "jpeg", "webp"]

_OUT_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, n_bytes bigint, "
    "mean_byte double, thumb_width int, thumb_height int, frame_hash string"
)


def synthesize_binary_column(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake image payload + metadata to each doc.

    Real pipelines read the binary from `spark.read.format("binaryFile")`
    or a parquet binary column; the synthetic payload exercises the same
    downstream plumbing."""
    w = (F.col("doc_id") % 8 + 1) * 32
    h = (F.col("doc_id") % 5 + 1) * 32
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    header = F.concat(
        F.lpad(w.cast("string"), 4, "0"),
        F.lpad(h.cast("string"), 4, "0"),
        F.rpad(fmt, 4, "."),
    )
    body = F.substring(F.repeat(F.md5(F.col("text")), 2), 1, 64)
    return docs.select(
        "doc_id",
        fmt.alias("meta_format"),
        w.cast("int").alias("meta_width"),
        h.cast("int").alias("meta_height"),
        F.concat(header.cast("binary"), body.cast("binary")).alias("payload"),
    )


def _decode_payload(payload: bytes) -> tuple[str, int, int, bytes]:
    """STUB decode. Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.format.lower(), img.width, img.height, img.tobytes()
    """
    if MM_REAL_DECODE:  # pragma: no cover
        raise NotImplementedError("no decoder library in this container")
    w = int(payload[0:4])
    h = int(payload[4:8])
    fmt = payload[8:12].rstrip(b".").decode("ascii")
    return fmt, w, h, payload[12:]


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode → feature-extract → thumbnail-resize
    (metadata math) → frame hash. One Arrow batch in, one out. Zipped
    column iteration, not iterrows — iterrows boxes every value into a
    per-row Series and was the batch's dominant cost."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            fmt, w, h, pixels = _decode_payload(bytes(payload))
            mean_byte = sum(pixels) / len(pixels) if pixels else 0.0
            scale = max(w, h) / 32 or 1
            out.append(
                (
                    doc_id,
                    fmt,
                    w,
                    h,
                    len(payload),
                    mean_byte,
                    int(w / scale),
                    int(h / scale),
                    hashlib.md5(pixels).hexdigest(),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "fmt",
                "width",
                "height",
                "n_bytes",
                "mean_byte",
                "thumb_width",
                "thumb_height",
                "frame_hash",
            ],
        )


def mm_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: synthesize payloads, then decode/extract
    via Arrow-batched mapInPandas. Rows-only correctness check (the
    decode stub is Python-side by design)."""
    from blog_snapshotbackup_azuredatalake_spark.session import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    docs = load_table(spark, sf_dir, "documents")
    with_bin = synthesize_binary_column(docs)
    return with_bin.mapInPandas(_decode_batches, schema=_OUT_SCHEMA)


QUERIES = {"mm_decode_pipeline": mm_decode_pipeline}
ORACLES: dict[str, str] = {}  # rows-only: Python decode stub by design
