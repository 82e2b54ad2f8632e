"""Property tests (hypothesis) for the portable hash/vector helpers.

These run the Spark expressions against a python/duckdb model over
generated inputs — the helpers are the trust anchor for every manifest
and oracle comparison, so they get adversarial inputs, not just the
testdata distributions.
"""

import hashlib
import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from blog_snapshotbackup_azuredatalake_spark.functions.hashing import (
    SEP,
    md5_int60,
    row_hash,
    sql_md5_int60,
)
from blog_snapshotbackup_azuredatalake_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)

# no control chars (SEP itself excluded by design contract), ASCII-ish
_txt = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=20,
)
_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(st.tuples(_txt, _txt), min_size=1, max_size=8))
@_SLOW
def test_row_hash_matches_python_model(spark, vals):
    df = spark.createDataFrame(
        vals,
        StructType(
            [StructField("a", StringType()), StructField("b", StringType())]
        ),
    )
    got = [r["h"] for r in df.select(row_hash("a", "b").alias("h")).collect()]
    want = [
        hashlib.md5(f"{a}{SEP}{b}".encode()).hexdigest() for a, b in vals
    ]
    assert got == want


@given(s=_txt)
@_SLOW
def test_md5_int60_matches_duckdb(spark, s):
    df = spark.createDataFrame(
        [(s,)], StructType([StructField("x", StringType())])
    )
    got = df.select(md5_int60("x").alias("h")).collect()[0]["h"]
    want = duckdb.execute(
        f"SELECT {sql_md5_int60('?')} AS h", [s]
    ).fetchone()[0]
    assert got == want
    assert 0 <= got < 2**60


def _nonzero(v):  # zero-norm → ANSI divide-by-zero; real embeddings aren't
    return any(abs(x) > 0.01 for x in v)


_vec = st.lists(
    st.floats(
        min_value=-10, max_value=10, allow_nan=False, width=32
    ),
    min_size=1,
    max_size=8,
).filter(_nonzero)


@given(ab=st.tuples(_vec, _vec).filter(lambda t: len(t[0]) == len(t[1])))
@_SLOW
def test_dot_and_cosine_match_python(spark, ab):
    a, b = ab
    df = spark.createDataFrame(
        [(a, b)],
        StructType(
            [
                StructField("a", ArrayType(FloatType())),
                StructField("b", ArrayType(FloatType())),
            ]
        ),
    )
    row = df.select(
        dot_product("a", "b").alias("dot"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    # identical fold: left-to-right double accumulation over float32 values
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    dot = 0.0
    for x, y in zip(a, b):
        dot += f32(x) * f32(y)
    assert row["dot"] == dot
    na = math.sqrt(sum(f32(x) * f32(x) for x in a))
    nb = math.sqrt(sum(f32(y) * f32(y) for y in b))
    if na * nb != 0.0:
        assert row["cos"] == dot / (na * nb)


def test_grams_of_short_docs_are_empty(spark):
    """< 5 tokens ⇒ no 5-grams; the ANSI-mode element_at guard holds."""
    from blog_snapshotbackup_azuredatalake_spark.operators import dedup

    df = spark.createDataFrame(
        [("a b c",), ("a b c d e f",), ("",)],
        StructType([StructField("text", StringType())]),
    )
    # reuse the expression pipeline on an ad-hoc frame
    toks = F.transform(
        F.split(F.col("text"), " "), lambda t: dedup._hash60(t) % dedup.P31
    )
    staged = df.select(toks.alias("th"))
    th = F.col("th")

    def gram(i):
        acc = F.element_at(th, i)
        for off in range(1, 5):
            acc = (acc * dedup.K_POLY + F.element_at(th, i + off)) % dedup.P31
        return acc

    grams = F.transform(F.sequence(F.lit(1), F.size(th) - 4), gram)
    sh = F.when(F.size(th) >= 5, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS array<bigint>)")
    )
    sizes = [r["n"] for r in staged.select(F.size(sh).alias("n")).collect()]
    assert sizes == [0, 2, 0]


# -- transaction log: fold(state) must equal a reference dict model -------

_paths = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=12
)


@given(ops=_paths, removes=st.lists(st.booleans(), min_size=12, max_size=12))
@settings(max_examples=25, deadline=None)
def test_txnlog_state_fold_matches_model(tmp_path_factory, ops, removes):
    from blog_snapshotbackup_azuredatalake_spark.operators.txnlog import (
        TransactionLog,
    )

    root = tmp_path_factory.mktemp("txn")
    log = TransactionLog(str(root))
    model: dict[str, int] = {}
    for i, (path, do_remove) in enumerate(zip(ops, removes)):
        if do_remove and path in model:
            v = log.commit("op", [{"remove": {"path": path}}])
            model.pop(path)
        else:
            v = log.commit("op", [{"add": {"path": path}}])
            model[path] = v
        assert v == i  # versions are dense and ordered
        got = log.state()
        assert set(got) == set(model)
        for p, meta in got.items():
            assert meta["version"] == model[p]
    # time travel at every prefix replays to the same fold
    replay: dict[str, int] = {}
    for i, (path, do_remove) in enumerate(zip(ops, removes)):
        if do_remove and path in replay:
            replay.pop(path)
        else:
            replay[path] = i
        assert set(log.state(as_of=i)) == set(replay)


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_bijective_and_axis_monotone(x1, y1, x2, y2):
    """The generated interleave SQL (shared verbatim by the Spark plan
    and the DuckDB oracle) must be a bijection on 16-bit pairs and
    strictly monotone along each axis — the properties that make
    z-value ranges prune on both dimensions."""
    import duckdb

    from blog_snapshotbackup_azuredatalake_spark.operators.quality import (
        _interleave_sql,
    )

    con = duckdb.connect()
    expr = _interleave_sql("x", "y")
    rows = con.execute(
        f"SELECT {expr} FROM (SELECT CAST(a AS BIGINT) x, CAST(b AS BIGINT) y"
        f" FROM (VALUES ({x1}, {y1}), ({x2}, {y2})) t(a, b))"
    ).fetchall()
    z1, z2 = rows[0][0], rows[1][0]
    assert (z1 == z2) == ((x1, y1) == (x2, y2))
    if y1 == y2 and x1 < x2:
        assert z1 < z2
    if x1 == x2 and y1 < y2:
        assert z1 < z2


def test_knn_graph_dims_formula_matches_duckdb():
    """The adaptive bucket-width formula runs in Python (operator) and
    SQL (oracle); they must agree for every corpus size, including the
    exact power-of-two boundaries where a sloppy log2 would diverge."""
    import duckdb

    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        KNN_GRAPH_DIMS,
        KNN_TARGET_BUCKET,
        _knn_graph_dims,
    )

    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        KNN_BUCKET_CAP,
        _knn_subsplits,
    )

    con = duckdb.connect()
    sizes = [1, 2, 255, 256, 257, 511, 512, 16384, 16385, 32768, 65536,
             131072, 131073, 1 << 20, (1 << 20) + 1, 10**9]
    for n in sizes:
        sql_dims = con.sql(
            f"SELECT GREATEST({KNN_GRAPH_DIMS}, CAST(CEIL(LOG2("
            f"GREATEST({n}, 1) / {KNN_TARGET_BUCKET}.0)) AS INT))"
        ).fetchone()[0]
        assert sql_dims == _knn_graph_dims(n), (n, sql_dims)
        # occupancy-cap sub-split count: integer ceil must agree too
        sql_ns = con.sql(
            f"SELECT ({n} + {KNN_BUCKET_CAP} - 1) // {KNN_BUCKET_CAP}"
        ).fetchone()[0]
        assert sql_ns == _knn_subsplits(n), (n, sql_ns)
