"""Wide-plan codegen cliff, measured (r11).

The 100 TB guidance "widen the WholeStageCodegen spans" INVERTS on
very wide plans, and this probe pins the measurement: a 300-column
full aggregate (the profiling-operator shape on a wide fact table)
runs 2.2-2.9x SLOWER with codegen FORCED (spark.sql.codegen.maxFields
raised to 1000 -> 4 codegen spans engage) than with Spark's default
cap (100 -> the plan falls back to the volcano operators); the
BASELINE.md r11 row records the committed run (5.46 s vs 1.86-2.11 s,
2.9x). The
generated method for 300 accumulating columns blows past the JIT's
method limits (hugeMethodLimit), so the JVM runs the giant generated
bytecode INTERPRETED -- worse than Spark's hand-written iterators.

Posture: the default cap is protective; do NOT raise maxFields for
wide profiling/aggregation. A wide-table profiler that wants codegen
back should chunk its aggregate into <=100-field column batches and
join the 1-row results (narrow plans per batch), paying tiny 1-row
joins for codegen'd scans.

A/B/A protocol (order-controlled; fresh DataFrame per timing run so
AQE exchange reuse cannot fake a warm number -- the trap this probe's
own first draft fell into).

Usage: python tools/widecols_probe.py [n_cols] [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_RUNS = 3


def main(argv):
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.session import get_spark

    n_cols = int(argv[0]) if argv else 300
    n_rows = int(argv[1]) if len(argv) > 1 else 2_000_000
    spark = get_spark("widecols-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n_rows).select(
        "id",
        *[(F.col("id") * (i + 1) % 997).cast("double").alias(f"c{i}")
          for i in range(n_cols)],
    ).localCheckpoint()
    aggs = [F.sum(f"c{i}").alias(f"s{i}") for i in range(n_cols)]

    def run(max_fields: str):
        spark.conf.set("spark.sql.codegen.maxFields", max_fields)
        probe = df.agg(*aggs)
        probe.collect()  # finalize AQE so the tree carries real markers
        tree = probe._jdf.queryExecution().executedPlan().toString()
        spans = tree.count("*(")  # tree format marks codegen'd nodes *(id)
        best = float("inf")
        for _ in range(N_RUNS):
            q = df.agg(*aggs)  # FRESH plan: no AQE exchange reuse
            t0 = time.perf_counter()
            q.collect()
            best = min(best, time.perf_counter() - t0)
        return spans, round(best, 3)

    # A/B/A order control
    spans_d1, t_d1 = run("100")
    spans_f, t_f = run("1000")
    spans_d2, t_d2 = run("100")
    out = {
        "n_cols": n_cols, "n_rows": n_rows, "runs": N_RUNS,
        "default_cap": {"codegen_spans": spans_d1, "best_s": t_d1,
                        "best_s_repeat": t_d2},
        "forced_codegen": {"codegen_spans": spans_f, "best_s": t_f},
        "forced_vs_default": round(t_f / min(t_d1, t_d2), 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
