"""Unit tests for operators.scd (SCD2 merge semantics on planted rows)."""

from __future__ import annotations

from etl_upc_syllabus_spark.operators.scd import scd2_merge


def _dim(spark):
    # k1: open + one closed-history row; k2, k3: open only
    rows = [
        (1, "A", "2019-01-01", "2020-01-01", 0),  # closed history
        (1, "B", "2020-01-01", "9999-12-31", 1),
        (2, "C", "2020-01-01", "9999-12-31", 1),
        (3, "D", "2020-01-01", "9999-12-31", 1),
    ]
    return spark.createDataFrame(
        rows, ["k", "attr", "valid_from", "valid_to", "is_current"]
    )


def test_scd2_merge_semantics(spark):
    updates = spark.createDataFrame(
        [(1, "B2"), (2, "C")],  # k1 changes, k2 is a no-op, k3 absent
        ["k", "attr"],
    )
    out = scd2_merge(_dim(spark), updates, "k", ["attr"], "2024-06-01")
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(
        [
            (1, "A", "2019-01-01", "2020-01-01", 0),  # history preserved
            (1, "B", "2020-01-01", "2024-06-01", 0),  # closed at eff date
            (1, "B2", "2024-06-01", "9999-12-31", 1),  # new open version
            (2, "C", "2020-01-01", "9999-12-31", 1),  # no-op untouched
            (3, "D", "2020-01-01", "9999-12-31", 1),  # absent untouched
        ]
    )


def test_scd2_merge_empty_batch(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame([], "k int, attr string")
    out = scd2_merge(dim, updates, "k", ["attr"], "2024-06-01")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_merge_multi_attr_any_change_closes(spark):
    dim = spark.createDataFrame(
        [(1, "A", "x", "2020-01-01", "9999-12-31", 1)],
        ["k", "a1", "a2", "valid_from", "valid_to", "is_current"],
    )
    updates = spark.createDataFrame([(1, "A", "y")], ["k", "a1", "a2"])  # only a2 differs
    out = scd2_merge(dim, updates, "k", ["a1", "a2"], "2024-06-01")
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(
        [
            (1, "A", "x", "2020-01-01", "2024-06-01", 0),
            (1, "A", "y", "2024-06-01", "9999-12-31", 1),
        ]
    )


def test_cdc_apply_latest_wins_and_deletes_vanish(spark):
    from etl_upc_syllabus_spark.operators.scd import cdc_apply

    log = spark.createDataFrame(
        [
            # key 1: I -> U -> U : latest U wins
            (1, 10, "I", 100.0),
            (1, 11, "U", 150.0),
            (1, 12, "U", 175.0),
            # key 2: I -> D : deleted
            (2, 20, "I", 50.0),
            (2, 21, "D", 0.0),
            # key 3: D -> I (resurrection): latest is I, survives
            (3, 30, "D", 0.0),
            (3, 31, "I", 75.0),
            # key 4: single insert
            (4, 40, "I", 25.0),
        ],
        ["k", "seq", "op", "price"],
    )
    out = {r["k"]: r for r in cdc_apply(log, key="k", seq="seq").collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["seq"] == 12 and out[1]["price"] == 175.0
    assert out[3]["seq"] == 31 and out[3]["price"] == 75.0
    assert out[4]["price"] == 25.0
