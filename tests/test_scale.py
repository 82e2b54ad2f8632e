"""Scale-technique operators vs DuckDB oracle, plus salting invariants."""

import pyspark.sql.functions as F
import pytest

from blog_snapshotbackup_azuredatalake_spark.functions.skew import salted_join
from blog_snapshotbackup_azuredatalake_spark.operators import scale
from blog_snapshotbackup_azuredatalake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(scale.QUERIES))
def test_scale_matches_oracle(spark, ddb, name):
    df = scale.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, scale.ORACLES[name])


def test_salted_join_equals_plain_join(spark):
    """Salting must change shuffle distribution only, never results —
    including left-join null rows for fact keys missing from the dim."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_custkey") % 2 == 0)  # force unmatched fact keys
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    for how in ["inner", "left"]:
        plain = sorted(
            tuple(r) for r in orders.join(cust, "o_custkey", how).collect()
        )
        salted = sorted(
            tuple(r)
            for r in salted_join(
                orders, cust, "o_custkey", n_salt=8, how=how
            ).collect()
        )
        assert salted == plain, how


def test_range_join_spotcheck(spark):
    """Python recompute of n_recent_clicks for a sample of purchases."""
    ev = scale._events(spark, SF_DIR).collect()
    clicks = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(r["ts_us"])
    got = {
        r["event_id"]: r["n_recent_clicks"]
        for r in scale.q_range_join(spark, SF_DIR).collect()
    }
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    assert len(got) == len(purchases)
    for r in purchases[:200]:
        want = sum(
            1
            for t in clicks.get(r["user_id"], [])
            if r["ts_us"] - scale.RANGE_WINDOW_US <= t < r["ts_us"]
        )
        assert got[r["event_id"]] == want


def test_aqe_splits_skewed_join_at_runtime(spark):
    """SURVEY §6 claims AQE handles join skew on the scale path —
    assert it actually fires: a 90%-one-key fact sort-merge-joined to a
    dim must show skew=true in the final adaptive plan under skew-join
    thresholds scaled to this data size."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("padpadpadpadpadpad-"), F.col("id")).alias(
                "payload"
            ),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), F.col("id").alias("dim_val")
        )
        joined = fact.join(dim, "k")
        # collect() on the frame itself so ITS queryExecution is the one
        # that runs (count() would execute a separate plan, leaving this
        # one with isFinalPlan=false)
        assert len(joined.collect()) == 200_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
