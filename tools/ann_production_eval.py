"""Production-path ANN evidence (VERDICT r7 item 5): recall@5 and
wall-time of ivf_pq_adc_topk at sf1 with TRAINED codebooks (spark.ml
KMeans coarse quantizer + per-subspace PQ k-means) next to the
prefix-codebook registry configuration, both against exact brute
force.

The registry query keeps deterministic prefix codebooks so the DuckDB
oracle can replay it; this script proves the ``centroids``/``cents``
seams carry real fits at scale. Results are recorded in BASELINE.md.

Usage: python tools/ann_production_eval.py [sf_dir]
       python tools/ann_production_eval.py --dim 1536 --n 8000

The ``--dim`` mode swaps the fixture for a deterministic synthetic
corpus at PRODUCTION embedding widths (768-1536 -- the fixture is
dim 64), proving the same trained-codebook path holds where deployed
text embeddings live; the r8 one-literal codebook fold is what makes
query builds affordable there (K*dim per-element folding cost 14 s of
driver time per build at dim 1536 before the fix).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_upc_syllabus_spark.operators import similarity as sim
from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.tables import fan_out, load_table

QUERY_LO, QUERY_HI, K = 10, 20, 5


def timed_topk(df) -> tuple[float, set[tuple[int, int]]]:
    """One timed execution per config: the timed region is the collect
    of the bounded top-k result (|queries| * k rows), so the run that
    is timed IS the run whose pairs are scored -- a separate noop-write
    timing pass would re-execute the whole plan (review r8)."""
    t0 = time.perf_counter()
    rows = df.collect()
    secs = round(time.perf_counter() - t0, 2)
    return secs, {(r["query_id"], r["cand_id"]) for r in rows}


def synthetic_embeddings(spark, n: int, dim: int, seed: int = 11, n_clusters: int = 64):
    """Deterministic wide-dim corpus (ids 0..n-1) with PLANTED cluster
    structure: point = cluster center + gaussian noise. iid-uniform
    vectors are the wrong eval corpus at production widths -- cosine
    similarity concentrates near 0 and the 'true' top-k is arbitrary,
    so every quantizer scores ~0 recall on pure noise. Real text
    embeddings are heavily clustered; planting clusters makes
    brute-force truth meaningful (a query's neighbors share its
    cluster) and recall attributable to the index, not the corpus.
    Seeded so reruns score identically."""
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[rng.randrange(n_clusters)]
        rows.append((i, [x + rng.gauss(0.0, 0.25) for x in c]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).repartition(32)


def main() -> None:
    args = sys.argv[1:]
    sf_dir, dim, n = "scale_data/sf1", None, 8000
    while args:
        a = args.pop(0)
        if a == "--dim":
            dim = int(args.pop(0))
        elif a == "--n":
            n = int(args.pop(0))
        else:
            sf_dir = a
    spark = get_spark("ann-production-eval")
    spark.sparkContext.setLogLevel("ERROR")
    if dim is not None:
        emb = synthetic_embeddings(spark, n, dim).persist()
        emb.count()
    else:
        dim = 64  # the fixture's embedding width
        emb = fan_out(load_table(spark, sf_dir, "embeddings"))

    from pyspark.sql import functions as F

    qpred = (F.col("vec_id") >= QUERY_LO) & (F.col("vec_id") < QUERY_HI)
    truth_df = sim.cosine_topk_bruteforce(emb, query_pred=qpred, k=K)
    t_brute, truth = timed_topk(truth_df)

    results = {"sf_dir": sf_dir, "dim": dim, "k": K, "brute_force_sec": t_brute}

    if dim > 64:
        # Production widths change the meaningful measurements: the
        # coarse stage is scored by probing recall with EXACT distances
        # (cosine_topk_ivf), and ADC recall is a function of PQ
        # resolution -- deployments run m ~ dim/12 (FAISS-typical), not
        # the fixture's m=4, because same-cluster candidates tie under
        # a too-coarse code and the top-k within the tie is arbitrary.
        t0 = time.perf_counter()
        coarse = sim.kmeans_centroids(emb, k=16)
        cents32 = sim.pq_train_codebook(emb, m=16, kc=32, dim=dim)
        t_train = round(time.perf_counter() - t0, 2)
        wide_cfgs = {
            "ivf_exact_trained_c16_p4": lambda: sim.cosine_topk_ivf(
                emb, n_centroids=16, nprobe=4, k=K, query_pred=qpred,
                centroids=coarse,
            ),
            "ivfpq_trained_m16_kc32_c16_p4": lambda: sim.ivf_pq_adc_topk(
                emb, n_centroids=16, nprobe=4, m=16, kc=32, dim=dim,
                query_lo=QUERY_LO, query_hi=QUERY_HI, k=K,
                centroids=coarse, cents=cents32,
            ),
            "ivfpq_trained_m64_kc32_c16_p4": lambda: sim.ivf_pq_adc_topk(
                emb, n_centroids=16, nprobe=4, m=64, kc=32, dim=dim,
                query_lo=QUERY_LO, query_hi=QUERY_HI, k=K,
                centroids=coarse,
                cents=sim.pq_train_codebook(emb, m=64, kc=32, dim=dim),
            ),
            # the full production query shape: ADC shortlist -> exact
            # re-rank (FAISS IVFADC+refine); recall returns to ~1.0
            # while touching only `shortlist` raw vectors per query;
            # the shortlist must EXCEED the ADC tie width (~cluster size),
            # else recall caps at shortlist/tie_width (measured 0.5 at r100
            # with ~190-point clusters)
            "ivfpq_rerank_m16_kc32_c16_p4_r250": lambda: sim.ivf_pq_rerank_topk(
                emb, n_centroids=16, nprobe=4, m=16, kc=32, dim=dim,
                query_lo=QUERY_LO, query_hi=QUERY_HI, shortlist=250, k=K,
                centroids=coarse, cents=cents32,
            ),
        }
        results["train_sec_coarse_plus_m16"] = t_train
        for name, build in wide_cfgs.items():
            t0 = time.perf_counter()
            df = build()
            t_build = round(time.perf_counter() - t0, 2)
            secs, got = timed_topk(df)
            results[name] = {
                "recall_at_5": round(len(truth & got) / len(truth), 3),
                "build_sec": t_build,
                "query_sec": secs,
            }
        spark.stop()
        print(json.dumps(results))
        return
    configs = {
        # the oracle-reproducible registry configuration
        "prefix_m4_kc4_c8_p2": dict(n_centroids=8, nprobe=2, m=4, kc=4),
        # IDENTICAL geometry, trained codebooks -- isolates the pure
        # training gain (same m, kc, centroid count, probe width)
        "trained_m4_kc4_c8_p2": dict(n_centroids=8, nprobe=2, m=4, kc=4),
        # bigger codebook, UNtrained (prefix) -- isolates resolution
        "prefix_m4_kc16_c8_p2": dict(n_centroids=8, nprobe=2, m=4, kc=16),
        # trained + a larger PQ codebook (kc 4 -> 16): training gain
        # plus quantization-resolution gain, separately attributable
        "trained_m4_kc16_c8_p2": dict(n_centroids=8, nprobe=2, m=4, kc=16),
        # production sizing: more subspaces, bigger codebook, wider probe
        "trained_m8_kc32_c16_p4": dict(n_centroids=16, nprobe=4, m=8, kc=32),
    }
    for name, cfg in configs.items():
        kwargs = dict(cfg, query_lo=QUERY_LO, query_hi=QUERY_HI, k=K, dim=dim)
        t_train = 0.0
        if name.startswith("trained"):
            t0 = time.perf_counter()
            kwargs["centroids"] = sim.kmeans_centroids(emb, k=cfg["n_centroids"])
            kwargs["cents"] = sim.pq_train_codebook(
                emb, m=cfg["m"], kc=cfg["kc"], dim=dim
            )
            t_train = round(time.perf_counter() - t0, 2)
        df = sim.ivf_pq_adc_topk(emb, **kwargs)
        secs, got = timed_topk(df)
        results[name] = {
            "recall_at_5": round(len(truth & got) / len(truth), 3),
            "query_sec": secs,
            "train_sec": t_train,
        }
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
