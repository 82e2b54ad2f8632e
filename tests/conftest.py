from __future__ import annotations

import math
import os

import duckdb
import pytest

from blog_snapshotbackup_azuredatalake_spark.session import get_session
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def assert_matches_oracle(spark_df, ddb_con, sql, float_tol=0.0):
    """Mirror of the driver's t2 gate: row count, column names, and
    order-insensitive value equality between Spark result and DuckDB."""
    def _key(row):
        return tuple((v is None, str(type(v)), repr(v)) for v in row)

    scols = sorted(spark_df.columns)
    srows = sorted(
        (tuple(_norm(r[c]) for c in scols) for r in spark_df.collect()),
        key=_key,
    )
    res = ddb_con.execute(sql)
    ocols_raw = [d[0] for d in res.description]
    orows_raw = res.fetchall()
    ocols = sorted(ocols_raw)
    idx = [ocols_raw.index(c) for c in ocols]
    orows = sorted(
        (tuple(_norm(row[i]) for i in idx) for row in orows_raw), key=_key
    )
    assert scols == ocols, f"columns differ: spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    )
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        for c, sv, ov in zip(ocols, sr, orow):
            if (
                float_tol
                and isinstance(sv, float)
                and isinstance(ov, float)
                and sv != ov
            ):
                assert math.isclose(sv, ov, rel_tol=float_tol), (
                    f"row {i} col {c}: {sv!r} != {ov!r}"
                )
            else:
                assert sv == ov, f"row {i} col {c}: {sv!r} != {ov!r}"
