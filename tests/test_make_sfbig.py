"""The sfbig generator underpins the SCALING.md sf1 evidence — certify
its invariants at factor=2 over sf0.001: row counts scale, keys stay
unique, referential integrity holds, events keep the driver's
timestamp schema, and per-copy document text is decorrelated."""

import pytest
import subprocess
import sys
import tempfile

import pyspark.sql.functions as F

from blog_snapshotbackup_azuredatalake_spark.operators.quality import (
    dq_referential,
)
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

def test_sfbig_generator_invariants(spark):
    out = tempfile.mkdtemp(prefix="sfbig_test_") + "/sf0.002"
    subprocess.run(
        [sys.executable, "scripts/make_sfbig.py", SF_DIR, out, "2"],
        check=True,
        capture_output=True,
        cwd="/root/repo",
    )
    base_docs = load_table(spark, SF_DIR, "documents")
    big_docs = load_table(spark, out, "documents")
    assert big_docs.count() == 2 * base_docs.count()
    assert (
        big_docs.select("doc_id").distinct().count() == big_docs.count()
    ), "doc ids must stay unique across copies"

    # events keep the native timestamp schema (oracles use epoch_ns(ts));
    # load_table still normalizes to bigint nanos in memory
    ev = load_table(spark, out, "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
    assert ev.count() == 2 * load_table(spark, SF_DIR, "events").count()

    # referential integrity holds through the key shifting
    orphans = dq_referential(spark, out).collect()
    assert all(r["n_orphans"] == 0 for r in orphans), orphans

    # copy-1 text is decorrelated from copy-0 (no identical bodies)
    overlap = (
        big_docs.filter(F.col("doc_id") < 1_000_000_000)
        .select(F.md5("text").alias("h"))
        .join(
            big_docs.filter(F.col("doc_id") >= 1_000_000_000).select(
                F.md5("text").alias("h")
            ),
            "h",
        )
        .count()
    )
    assert overlap == 0


def test_sfbig_two_stage_ids_stay_unique(spark):
    """Chained generation (sf0.1 → sf1 → sf10) must keep ids unique:
    a fixed per-copy offset stacks additively across stages and
    collides (caught at sf10 — duplicate doc_ids corrupted every
    per-doc self-join); the generator now strides above the source's
    actual key range."""
    work = tempfile.mkdtemp(prefix="sfbig_test2_")
    mid, out = f"{work}/mid", f"{work}/out"
    for src, dst, f in [(SF_DIR, mid, "2"), (mid, out, "3")]:
        subprocess.run(
            [sys.executable, "scripts/make_sfbig.py", src, dst, f],
            check=True,
            capture_output=True,
            cwd="/root/repo",
        )
    base_n = load_table(spark, SF_DIR, "documents").count()
    docs = load_table(spark, out, "documents")
    assert docs.count() == 6 * base_n
    assert docs.select("doc_id").distinct().count() == docs.count()
    orders = load_table(spark, out, "orders")
    assert orders.select("o_orderkey").distinct().count() == orders.count()
