"""Planted-graph tests for operators.graph.pagerank (oracle parity for
the bound query lives in test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.operators.graph import copurchase_edges, pagerank


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_pagerank_uniform_on_ring(spark):
    # symmetric 4-ring: perfectly regular graph -> pr stays 1/N forever
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=3).collect()}
    assert pr == {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}


def test_pagerank_star_one_round_by_hand(spark):
    # hub 0 <-> spokes 1,2,3. N=4, deg(hub)=3, deg(spoke)=1.
    # round 1: s(hub) = 3 * 0.25 = 0.75      -> pr = 0.0375 + 0.85*0.75
    #          s(spoke) = 0.25/3 (rounded 12) -> pr = 0.0375 + 0.85*that
    edges = _sym(spark, [(0, 1), (0, 2), (0, 3)])
    pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=1).collect()}
    assert pr[0] == pytest.approx(0.675, abs=1e-12)
    spoke = round(0.0375 + 0.85 * round(0.25 / 3, 12), 12)
    assert pr[1] == pr[2] == pr[3] == pytest.approx(spoke, abs=1e-12)


def test_pagerank_mass_conserved(spark):
    edges = _sym(spark, [(0, 1), (0, 2), (2, 3), (3, 4), (4, 0)])
    pr = [r["pr"] for r in pagerank(edges, n_iter=3).collect()]
    assert sum(pr) == pytest.approx(1.0, abs=1e-9)
    assert all(p > 0 for p in pr)


def test_pagerank_hub_outranks_leaf(spark):
    # hub touches every other node; leaves touch only the hub
    edges = _sym(spark, [(0, i) for i in range(1, 6)])
    pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=3).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 6))


def test_copurchase_edges_symmetric_no_self(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 10), (3, 99)],
        ["l_orderkey", "l_partkey"],
    )
    got = {(r["src"], r["dst"]) for r in copurchase_edges(li).collect()}
    want = {(10, 11), (11, 10), (10, 12), (12, 10), (11, 12), (12, 11)}
    assert got == want  # order 2's dup pair and order 3's singleton drop out


def test_triangle_counts_k4(spark):
    # K4: C(4,3)=4 triangles; each node participates in C(3,2)=3
    from etl_upc_syllabus_spark.operators.graph import triangle_counts

    k4 = _sym(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(k4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_path_and_star_have_none(spark):
    from etl_upc_syllabus_spark.operators.graph import triangle_counts

    path = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_counts(path).count() == 0
    star = _sym(spark, [(0, i) for i in range(1, 6)])
    assert triangle_counts(star).count() == 0


def test_triangle_counts_two_triangles_sharing_edge(spark):
    # 0-1-2 and 1-2-3: edge (1,2) shared; nodes 1,2 in two triangles
    from etl_upc_syllabus_spark.operators.graph import triangle_counts

    g = _sym(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(g).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_clustering_coefficient_k4_and_path(spark):
    from etl_upc_syllabus_spark.operators.graph import clustering_coefficient

    k4 = _sym(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {r["node"]: (r["d"], r["n_triangles"], r["cc"])
           for r in clustering_coefficient(k4).collect()}
    assert got == {i: (3, 3, 1.0) for i in range(4)}

    path = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["node"]: r["cc"] for r in clustering_coefficient(path).collect()}
    assert got == {1: 0.0, 2: 0.0}  # endpoints have d=1 -> excluded


def test_triangle_counts_sum_divisible_by_three(spark, sf_dir):
    """Every triangle contributes exactly one count to each of its
    three vertices, so the global sum is divisible by 3."""
    from etl_upc_syllabus_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )
    from etl_upc_syllabus_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    total = triangle_counts(copurchase_edges(li)).agg(F.sum("n_triangles")).first()[0]
    assert total is not None and total > 0
    assert total % 3 == 0


def test_triangle_estimate_exact_at_full_rate(spark):
    """sample_inv=1 keeps every edge: the DOULION estimate IS the
    exact global count (K4 has exactly 4 triangles)."""
    from etl_upc_syllabus_spark.operators.graph import triangle_total_estimate

    k4 = _sym(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    row = triangle_total_estimate(k4, sample_inv=1).first()
    assert row["sampled_triangles"] == 4
    assert row["est_triangles"] == 4


def test_triangle_estimate_sampled_deterministic_and_unbiased_band(spark, sf_dir):
    """On the fixture co-purchase graph: the hash-sampled estimate is
    (a) deterministic across runs and (b) within a generous band of
    the exact count at p=1/2 (DOULION relative error ~1/sqrt(T); the
    fixture graph is triangle-rich so 2x is far beyond the published
    variance bound -- catching only sign/scaling bugs, not noise)."""
    from etl_upc_syllabus_spark.operators.graph import (
        copurchase_edges,
        triangle_total_estimate,
    )
    from etl_upc_syllabus_spark.sources.tables import load_table

    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    exact = triangle_total_estimate(edges, sample_inv=1).first()["est_triangles"]
    e1 = triangle_total_estimate(edges, sample_inv=2).first()
    e2 = triangle_total_estimate(edges, sample_inv=2).first()
    assert e1 == e2, "hash sampling must be deterministic"
    assert exact / 2 <= e1["est_triangles"] <= exact * 2, (exact, e1)


def test_triangle_estimate_empty_sample_reports_zero(spark):
    """A sampling rate coarser than the graph (or a triangle-free
    sample) must report an honest 0 estimate, not NULL."""
    from etl_upc_syllabus_spark.operators.graph import triangle_total_estimate

    path = _sym(spark, [(0, 1), (1, 2)])  # no triangles at all
    row = triangle_total_estimate(path, sample_inv=1).first()
    assert row["sampled_triangles"] == 0
    assert row["est_triangles"] == 0
