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


def test_two_phase_agg_exact(skewed):
    direct = {
        r["k"]: r["total"]
        for r in skewed.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    salted = {r["k"]: r["total"] for r in skew.two_phase_agg(skewed, "k", F.col("v")).collect()}
    assert direct.keys() == salted.keys()
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-9
