"""Semantic tests for ANN operators on vectors with known geometry."""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.operators import similarity as sim
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vectors(spark):
    # vec 0 is the query; 1 is a near-copy, 2 orthogonal-ish, 3 opposite
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_ranking(vectors):
    res = sim.cosine_topk_bruteforce(vectors, query_pred=F.col("vec_id") == 0, k=4).collect()
    order = [r["cand_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert order == [1, 4, 2, 3]  # by cosine: 0.994, 0.707, 0, -1
    by_cand = {r["cand_id"]: r["cosine"] for r in res}
    assert by_cand[2] == 0.0 and by_cand[3] == -1.0


def test_lsh_bucket_excludes_opposite(vectors):
    res = sim.cosine_topk_lsh(
        vectors, dim=4, query_pred=F.col("vec_id") == 0, k=4
    ).collect()
    cands = {r["cand_id"] for r in res}
    # the opposite vector flips every hyperplane sign -> different bucket
    assert 3 not in cands
    # returned candidates are ranked by cosine descending
    ranked = sorted(res, key=lambda r: r["rank"])
    sims_ = [r["cosine"] for r in ranked]
    assert sims_ == sorted(sims_, reverse=True)


def test_lsh_bucket_is_deterministic(vectors):
    a = {(r["query_id"], r["cand_id"]) for r in sim.cosine_topk_lsh(vectors, dim=4, k=3).collect()}
    b = {(r["query_id"], r["cand_id"]) for r in sim.cosine_topk_lsh(vectors, dim=4, k=3).collect()}
    assert a == b


def test_ivf_kmeans_recall_against_bruteforce(spark, sf_dir):
    """The production IVF path (spark.ml KMeans codebook) must recover
    >= 0.8 of the exact brute-force top-k neighbors on the embeddings
    fixture -- the check a prefix-centroid placeholder codebook cannot
    pass by construction."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = F.col("vec_id") < 20
    k = 5
    exact = {
        (r["query_id"], r["cand_id"])
        for r in sim.cosine_topk_bruteforce(emb, query_pred=pred, k=k).collect()
    }
    centroids = sim.kmeans_centroids(emb, k=8)
    approx = {
        (r["query_id"], r["cand_id"])
        for r in sim.cosine_topk_ivf(
            emb, query_pred=pred, nprobe=4, k=k, centroids=centroids
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF-KMeans recall@{k} = {recall:.3f} < 0.8"
