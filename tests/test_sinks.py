"""copy_table / verify_copy: partition layout, file sizing, manifest."""

import pytest
import os

import pyspark.sql.functions as F

from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from blog_snapshotbackup_azuredatalake_spark.sources.sinks import (
    compact_files,
    copy_table,
    verify_copy,
)
from tests.conftest import SF_DIR, assert_matches_oracle


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

def test_copy_partitioned_with_manifest(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month",
        F.date_format("o_orderdate", "yyyy-MM"),
    )
    target = str(tmp_path / "orders_copy")
    stats = copy_table(
        orders,
        target,
        partition_by="order_month",
        max_records_per_file=200,
        manifest_key="o_orderkey",
    )
    assert stats["n_rows"] == orders.count()
    # hive layout: one directory per month
    parts = [d for d in os.listdir(target) if d.startswith("order_month=")]
    assert len(parts) > 1
    # file sizing respected
    for d in parts:
        for f in os.listdir(os.path.join(target, d)):
            if f.endswith(".parquet"):
                n = spark.read.parquet(os.path.join(target, d, f)).count()
                assert n <= 200
    # manifest readable and complete
    man = spark.read.parquet(f"{target}_manifest")
    assert man.count() == orders.count()
    assert set(man.columns) == {"key", "row_md5"}
    assert verify_copy(spark, orders, target)


def test_compaction_preserves_data_and_shrinks_file_count(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    p = str(tmp_path / "orders_many_files")
    orders.repartition(24).write.parquet(p)  # simulate incremental appends
    before = sorted(tuple(r) for r in spark.read.parquet(p).collect())
    stats = compact_files(spark, p, target_rows_per_file=100_000)
    assert stats["files_before"] == 24
    assert stats["files_after"] < stats["files_before"]
    after = sorted(tuple(r) for r in spark.read.parquet(p).collect())
    assert after == before


def test_verify_copy_detects_tamper(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    target = str(tmp_path / "nation_copy")
    copy_table(nation, target)
    assert verify_copy(spark, nation, target)
    tampered = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 0, F.lit("oops")).otherwise(
            F.col("n_name")
        ),
    )
    assert not verify_copy(spark, tampered, target)


def test_bucketed_copy_joins_without_shuffle(spark, tmp_path):
    import contextlib
    import io

    from blog_snapshotbackup_azuredatalake_spark.sources.sinks import (
        copy_table_bucketed,
    )

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/wh'"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    stats = copy_table_bucketed(orders, "bktdb.orders_a", "o_orderkey", 8)
    copy_table_bucketed(orders, "bktdb.orders_b", "o_orderkey", 8)
    assert stats["n_rows"] == orders.count()

    a = spark.table("bktdb.orders_a")
    b = spark.table("bktdb.orders_b").withColumnRenamed(
        "o_totalprice", "price_b"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        # the whole point of the bucketed layout: a co-located
        # sort-merge join with NO Exchange anywhere in the plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE bktdb.orders_a")
        spark.sql("DROP TABLE bktdb.orders_b")
        spark.sql("DROP DATABASE bktdb")


def test_copy_roundtrip_entry(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources import sinks
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    rows = sinks.snap_copy_roundtrip(spark, SF_DIR).collect()
    assert all(r["verified"] for r in rows)
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, SF_DIR, "orders").count()


def test_format_roundtrip_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.sources import sinks
    from tests.conftest import assert_matches_oracle

    df = sinks.snap_format_roundtrip(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sinks.ORACLES["snap_format_roundtrip"])


def test_format_roundtrip_formats_agree(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources import sinks

    rows = {r["fmt"]: r for r in sinks.snap_format_roundtrip(spark, SF_DIR).collect()}
    assert set(rows) == {"csv", "jsonl"}
    assert rows["csv"]["n_rows"] == rows["jsonl"]["n_rows"] > 0
    assert rows["csv"]["xor_checksum"] == rows["jsonl"]["xor_checksum"]


def test_merge_schema_evolve_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.sources import sinks
    from tests.conftest import assert_matches_oracle

    df = sinks.snap_merge_schema_evolve(spark, SF_DIR)
    assert_matches_oracle(df, ddb, sinks.ORACLES["snap_merge_schema_evolve"])


def test_merge_schema_evolve_null_fills_v1(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources import sinks

    r = sinks.snap_merge_schema_evolve(spark, SF_DIR).collect()[0]
    assert r["n_rows"] == r["n_v1_rows"] + r["n_v2_rows"]
    assert r["n_v2_rows"] > 0 and r["n_v1_rows"] > r["n_v2_rows"]
    assert r["n_fields"] == 4


from blog_snapshotbackup_azuredatalake_spark.sources import sinks as _si


@pytest.mark.parametrize("name", sorted(_si.ORACLES))
def test_sinks_matches_oracle(spark, ddb, name):
    df = _si.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, _si.ORACLES[name])
