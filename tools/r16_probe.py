"""Round-16 optimization probe: time headline queries in isolation and
dump their formatted physical plans.

Usage:
  python tools/r16_probe.py plans [--out plans/r16 --suffix _before] [names...]
      -> write .explain("formatted") for each query to <out>/<name><suffix>.txt
  python tools/r16_probe.py time [--runs N] [names...]
      -> per-query warm best-of-N with the noop sink (guide section 1.4),
         labeled jobs (section 1.5), printed as one JSON line.

Independent of bench.py so experiments never touch the official
artifact path. Defaults to the 15 headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from etl_upc_syllabus_spark.plans import all_specs  # noqa: E402
from etl_upc_syllabus_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in ("plans", "time"):
        print(__doc__)
        return 2
    mode, args = args[0], args[1:]
    out_dir = "plans/r16"
    suffix = "_before"
    runs = 3
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = all_specs()
    spark = get_spark("r16-probe")

    if mode == "plans":
        from etl_upc_syllabus_spark.explain import plan_of

        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = specs[name].fn(spark, sf_dir)
            _, formatted = plan_of(df)
            path = os.path.join(out_dir, f"{name}{suffix}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(formatted)
            print(f"wrote {path}")
        spark.stop()
        return 0

    timings: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r16 warmup: {name}")
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"r16 timed {i}: {name}")
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        timings[name] = samples
    spark.stop()
    best = {n: min(s) for n, s in timings.items()}
    print(json.dumps({"best": best, "total_best": round(sum(best.values()), 3),
                      "samples": timings, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
