"""Production-path ANN evidence (VERDICT r7 item 5): recall@5 and
wall-time of ivf_pq_adc_topk at sf1 with TRAINED codebooks (spark.ml
KMeans coarse quantizer + per-subspace PQ k-means) next to the
prefix-codebook registry configuration, both against exact brute
force.

The registry query keeps deterministic prefix codebooks so the DuckDB
oracle can replay it; this script proves the ``centroids``/``cents``
seams carry real fits at scale. Results are recorded in BASELINE.md.

Usage: python tools/ann_production_eval.py [sf_dir]
"""

from __future__ import annotations

import json
import os
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scale_data/sf1"
    spark = get_spark("ann-production-eval")
    spark.sparkContext.setLogLevel("ERROR")
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))

    from pyspark.sql import functions as F

    qpred = (F.col("vec_id") >= QUERY_LO) & (F.col("vec_id") < QUERY_HI)
    truth_df = sim.cosine_topk_bruteforce(emb, query_pred=qpred, k=K)
    t_brute, truth = timed_topk(truth_df)

    results = {"sf_dir": sf_dir, "k": K, "brute_force_sec": t_brute}
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
        kwargs = dict(cfg, query_lo=QUERY_LO, query_hi=QUERY_HI, k=K)
        t_train = 0.0
        if name.startswith("trained"):
            t0 = time.perf_counter()
            kwargs["centroids"] = sim.kmeans_centroids(emb, k=cfg["n_centroids"])
            kwargs["cents"] = sim.pq_train_codebook(
                emb, m=cfg["m"], kc=cfg["kc"]
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
