"""Format-generic loader: csv/json/text/binaryFile round trips."""

import pytest

from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
    load_path,
    load_table,
)
from tests.conftest import SF_DIR, assert_matches_oracle


pytestmark = pytest.mark.slow  # excluded from the ≈5¼-min smoke gate

def test_csv_round_trip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").csv(p)
    back = load_path(spark, p, "csv", schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_json_round_trip(spark, tmp_path):
    region = load_table(spark, SF_DIR, "region")
    p = str(tmp_path / "region_json")
    region.write.json(p)
    back = load_path(spark, p, "json", schema=region.schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_binary_file_source(spark, tmp_path):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"\x00\x01payload")
    df = load_path(spark, str(tmp_path), "binaryFile")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == b"\x00\x01payload"


def test_unknown_format_rejected(spark):
    with pytest.raises(KeyError):
        load_path(spark, "/nowhere", "xml")


def test_python_datasource_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.sources import pysource
    from tests.conftest import SF_DIR, assert_matches_oracle

    df = pysource.source_python_datasource(spark, SF_DIR)
    assert_matches_oracle(df, ddb, pysource.ORACLES["source_python_datasource"])


def test_python_datasource_partitions_scale_with_rows(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources import pysource

    spark.dataSource.register(pysource.SyntheticEventsDataSource)
    big = (
        spark.read.format("synthetic_events")
        .option("total_rows", str(3 * pysource.PYSRC_ROWS_PER_PARTITION + 1))
        .load()
    )
    assert big.rdd.getNumPartitions() == 4
    assert big.count() == 3 * pysource.PYSRC_ROWS_PER_PARTITION + 1


def test_python_stream_source_matches_oracle(spark, ddb):
    from blog_snapshotbackup_azuredatalake_spark.sources import pysource
    from tests.conftest import assert_matches_oracle

    df = pysource.source_python_stream(spark, SF_DIR)
    assert_matches_oracle(df, ddb, pysource.ORACLES["source_python_stream"])


def test_python_stream_source_drains_batchwise(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources import pysource

    rows = pysource.source_python_stream(spark, SF_DIR).collect()
    # the cursor must have advanced in the designed number of
    # micro-batches, not one gulp (and not stalled short)
    assert {r["n_microbatches"] for r in rows} == {
        pysource.PYSRC_STREAM_BATCHES
    }
    total = sum(r["n_rows"] for r in rows)
    assert total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()


from blog_snapshotbackup_azuredatalake_spark.sources import pysource as _ps


@pytest.mark.parametrize("name", sorted(_ps.ORACLES))
def test_pysource_matches_oracle(spark, ddb, name):
    df = _ps.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, _ps.ORACLES[name])
