"""Planted-case tests for operators.asof (both directions; oracle
parity for the bound queries lives in test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 35, "l35"), (2, 5, "l5")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 20, "b"), (1, 30, "c")], ["k", "ts", "rv"]
    )
    return left, right


def test_asof_backward(sides):
    left, right = sides
    got = {
        r["ts"]: r["asof_rv"]
        for r in asof_join(left, right, "k", "ts", "ts", ["rv"]).collect()
    }
    # 10 -> a (5); 20 -> b (inclusive tie); 35 -> c (30); key 2 -> none
    assert got == {10: "a", 20: "b", 35: "c", 5: None}


def test_asof_forward(sides):
    left, right = sides
    got = {
        r["ts"]: r["asof_rv"]
        for r in asof_join(
            left, right, "k", "ts", "ts", ["rv"], direction="forward"
        ).collect()
    }
    # 10 -> b (20); 20 -> b (inclusive tie); 35 -> none; key 2 -> none
    assert got == {10: "b", 20: "b", 35: None, 5: None}


def test_asof_rejects_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, "k", "ts", "ts", ["rv"], direction="nearest")
