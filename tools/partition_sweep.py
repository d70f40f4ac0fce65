"""Partition-count invariance sweep: the full oracle registry under a
cluster-like shuffle layout.

Tests and the driver gate run with 8-32 shuffle partitions; a real
1000-executor deployment runs with thousands. Any result that depends
on how rows land in partitions -- a per-partition seed, an implicit
reliance on everything fitting in one task, an ordering assumption a
single-partition run satisfies by luck -- passes every gate SF and
silently returns WRONG ANSWERS at scale. The engine's determinism
fences (hash-derived sampling, explicit tie-break orderings, decimal
money sums) are supposed to make every registry query a pure function
of its input TABLES, never of the partitioning; this sweep checks
that claim end-to-end by running EVERY ``queries()`` entry under an
alien partition layout and comparing against the same DuckDB oracles
the driver uses.

The same harness sweeps any other session-conf axis a deployment
controls via repeatable ``--conf key=value`` flags -- the r8 runs
covered ``spark.sql.ansi.enabled=false`` (legacy migration configs
must not shift values: nothing relies on ANSI failure semantics),
``spark.sql.codegen.wholeStage=false`` (interpreted and codegen'd
evaluation must agree), and ``spark.sql.adaptive.enabled=false``
(which also proves session.tune()'s re-pin, like the TZ suite).

Usage::

    python tools/partition_sweep.py [--npart 200] [--sf SF_DIR]
                                    [--only NAME[,NAME..]]
                                    [--conf key=value ...]

Output: one JSON line::

    {"npart": N, "conf": {...}, "total": N, "ok": N,
     "failed": {"name": "reason"}, "wall_s": N}

Queries without an ``oracle_sql()`` entry get the driver's weaker
rows>=0 execution check. AQE stays ON by default (the production
configuration; it must coalesce the oversized shuffles without
changing values).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    npart = 200
    sf = "/root/testdata/sf0.01"
    only: set[str] | None = None
    extra_conf: dict[str, str] = {}
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--npart":
            npart = int(args.pop(0))
        elif a == "--sf":
            sf = args.pop(0)
        elif a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--conf":
            k, _, v = args.pop(0).partition("=")
            extra_conf[k] = v
        else:
            raise SystemExit(f"unknown arg {a!r}")

    # an alien layout end to end: oversized shuffle partitioning AND a
    # mismatched default parallelism, exactly what a local[32] test
    # session never exercises
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", str(npart))
        .config("spark.default.parallelism", str(npart))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("partition_sweep")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    from tests.oracle_harness import compare, duckdb_run

    q, o = mod.queries(), mod.oracle_sql()
    failed: dict[str, str] = {}
    t00 = time.time()
    names = sorted(n for n in q if only is None or n in only)
    for name in names:
        try:
            df = q[name](spark, sf)
            if name in o:
                compare(df, duckdb_run(o[name], sf), name)
            else:
                assert df.count() >= 0
        except Exception as e:  # noqa: BLE001 -- sweep reports, never dies
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
    print(
        json.dumps(
            {
                "npart": npart,
                "conf": extra_conf,
                "total": len(names),
                "ok": len(names) - len(failed),
                "failed": failed,
                "wall_s": round(time.time() - t00, 1),
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
