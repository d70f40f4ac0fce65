"""Wall-clock evidence for quarantine_hostile's one-pass claim
(VERDICT r10 item 3 / the r11 fused gate).

The fused gate's value proposition is scan count: materializing BOTH
sides of the sequential three-gate chain costs 4 corpus scans (1 for
the collapsed clean side + 1 per quarantine report), the fused gate 2.
This tool measures that as wall-clock on the scale fixtures: same
corpus, same predicates (non-finite + timestamp-range on events; +
vector-width on embeddings), min-of-N of (clean.count() +
quarantine.count()) for each shape.

Two modes, both reported: ``count`` (clean.count + quarantine.count --
Catalyst prunes to the predicate columns, so this measures the scan
machinery alone and UNDERSTATES fusion) and ``write`` (noop-format
write of both sides -- full-row materialization, the real ingest
analog where every extra scan re-reads the payload bytes).

``--wide`` additionally synthesizes a PAYLOAD-HEAVY variant of sf1
events (a ~1 KB opaque string column next to the gate's predicate
columns) and runs the write-mode compare there.

**What this tool actually measured (r11), refining the scan-count
claim.** The structural claim (fused = 2 scans, sequential = 1 +
#axes) is plan-verified, but wall-clock showed the per-axis sequential
scans are NOT equal-cost: a PUSHABLE per-axis predicate gets pushed to
parquet when it stands alone -- the ts-range branch pushes
``Or(LessThan(ts,1900..), GreaterThanOrEqual(ts,2100..))``, so on a
clean corpus row-group statistics prune that scan to ~free -- while
the fused OR (carrying isnan/size(), never pushable) pushes NOTHING,
and neither shape's CLEAN side pushes (the NULL-stays-clean guard
blocks NOT-distribution into pushable conjuncts). Net: fusion saves
one full-payload scan per NON-pushable axis beyond the first
(non-finite and width are never pushable; timestamp-range is), plus
per-job overhead. Measured: narrow fixtures 1.04-1.55x fused;
wide-payload events with only ONE non-pushable axis active sits in
the parity band (0.85-1.11x), exactly what the pushdown analysis
predicts. At 100 TB the guidance is therefore: fuse when >= 2
non-pushable axes are active (always true once a vector or float
column is in play), and order standalone pushable gates FIRST if
composing sequentially.

Usage: python tools/fusion_bench.py [--wide] [sf_dir ...]  (default sf1, sf10)
Prints one JSON line per (sf_dir, table, mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_RUNS = 3


def measure(build, mode):
    best, n = float("inf"), None
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        clean, quar = build()
        if mode == "count":
            n = clean.count() + quar.count()
        else:
            clean.write.format("noop").mode("overwrite").save()
            quar.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), n


def main(argv):
    from etl_upc_syllabus_spark.operators import curation as cu
    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.tables import load_table

    wide = "--wide" in argv
    argv = [a for a in argv if a != "--wide"]
    sf_dirs = argv or [
        os.path.join(ROOT, "scale_data", "sf1"),
        os.path.join(ROOT, "scale_data", "sf10"),
    ]
    spark = get_spark("fusion-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def sequential(df, **kw):
        quars = []
        cur, q = cu.quarantine_nonfinite(df, kw.get("cols"))
        quars.append(q)
        if kw.get("vec_col"):
            cur, q = cu.quarantine_vector_width(cur, kw["vec_col"], kw.get("dim"))
            quars.append(q)
        if kw.get("ts_col"):
            cur, q = cu.quarantine_timestamp_range(cur, kw["ts_col"])
            quars.append(q)
        u = quars[0]
        for q in quars[1:]:
            u = u.unionByName(q)
        return cur, u

    for sf_dir in sf_dirs:
        for table, kw in [
            ("events", dict(ts_col="ts")),
            ("embeddings", dict(vec_col="embedding", dim=64)),
        ]:
            df = load_table(spark, sf_dir, table)
            for mode in ("count", "write"):
                t_seq, n_seq = measure(lambda: sequential(df, **kw), mode)
                t_fused, n_fused = measure(
                    lambda: cu.quarantine_hostile(df, **kw), mode
                )
                if mode == "count":
                    assert n_seq == n_fused, f"row mismatch {n_seq} != {n_fused}"
                print(json.dumps({
                    "sf_dir": os.path.basename(sf_dir), "table": table,
                    "mode": mode, "rows": n_fused,
                    "sequential_s": t_seq, "fused_s": t_fused,
                    "speedup": round(t_seq / t_fused, 2) if t_fused else None,
                    "runs": N_RUNS,
                }), flush=True)
    if wide:
        import tempfile

        from _bench_common import wide_payload_col

        src = load_table(spark, sf_dirs[0], "events")
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "events_wide.parquet")
            src.withColumn("payload", wide_payload_col()).repartition(32).write.parquet(path)
            df = spark.read.parquet(path)
            kw = dict(ts_col="ts")
            t_seq, _ = measure(lambda: sequential(df, **kw), "write")
            t_fused, _ = measure(lambda: cu.quarantine_hostile(df, **kw), "write")
            print(json.dumps({
                "sf_dir": os.path.basename(sf_dirs[0]), "table": "events+1KB payload",
                "mode": "write", "rows": df.count(),
                "sequential_s": t_seq, "fused_s": t_fused,
                "speedup": round(t_seq / t_fused, 2) if t_fused else None,
                "runs": N_RUNS,
            }), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
