"""Salted-join / two-phase-agg semantics: identical results to the
plain operators, with the hot key spread across salt shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(1, float(i % 10)) for i in range(900)] + [
        (k, float(k)) for k in range(2, 102)
    ]
    return spark.createDataFrame(rows, "k long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(k, f"name{k}") for k in range(1, 50)], "k long, name string")


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk")).drop("dk")
    s = skew.salted_join(
        skewed, dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk"), n_salts=4
    ).drop("dk")
    assert plain.count() == s.count() == 900 + 48
    assert (
        sorted(map(tuple, plain.collect())) == sorted(map(tuple, s.collect()))
    )


def test_salt_spreads_hot_key(skewed):
    shards = (
        skew.salted(skewed.filter("k = 1"), 4)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(shards) > 1  # the hot key occupies multiple shards


def test_salted_join_rejects_replication_unsafe_how(skewed, dim):
    # right/full would emit each unmatched small row once per salt
    # replica; semi/anti flip which side survives
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            skew.salted_join(skewed, dim, F.col("k") == F.col("k"), how=how)


def test_salted_left_join_keeps_unmatched_large_rows(skewed, dim):
    d = dim.withColumnRenamed("k", "dk")
    plain = skewed.join(d, F.col("k") == F.col("dk"), "left").drop("dk")
    s = skew.salted_join(skewed, d, F.col("k") == F.col("dk"), n_salts=4, how="left").drop("dk")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, s.collect()))


@pytest.mark.slow
def test_aqe_skew_join_engages(spark):
    """AQE skew-join splitting (the zero-code mitigation salted_join
    complements) demonstrably re-plans a skewed shuffle join: with
    test-scaled thresholds the executed plan marks the join skew=true
    and splits the hot partition."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        left = spark.range(200_000).select(
            (F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id"))).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
        )
        joined = left.join(right, "k")
        # collect() executes this DataFrame's own QueryExecution, so the
        # adaptive plan below is the final (post-re-optimization) one
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_two_phase_agg_exact(skewed):
    direct = {
        r["k"]: r["total"]
        for r in skewed.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    salted = {r["k"]: r["total"] for r in skew.two_phase_agg(skewed, "k", F.col("v")).collect()}
    assert direct.keys() == salted.keys()
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-9
