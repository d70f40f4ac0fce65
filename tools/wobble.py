"""Wobble-attribution protocol, institutionalized (BASELINE.md).

When a bench round shows a query slower than its recorded floor, the
documented protocol (used in the r6/r7/r8 notes) is: N INDEPENDENT
isolated bench invocations of just that query -- each a fresh process
with its own preflight load gate -- and compare the best floor
against the recorded one. On a host with +-35% inter-invocation
drift, a single inflated reading implicates nothing; a best-of-N
floor that reproduces the record attributes the wobble to host
noise, while a best-of-N floor stuck above the record (with a quiet
preflight) implicates a commit.

Usage: python tools/wobble.py QUERY [N] [SF_DIR]
Prints one JSON line: {"query": ..., "floors": [...], "best": ...,
"samples": [[...], ...], "preflight": [[...], ...]}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    query = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # fail fast on a typo'd name: bench.py would otherwise silently
    # filter it out AFTER paying a full preflight load-gate wait
    sys.path.insert(0, _REPO)
    from etl_upc_syllabus_spark.plans import all_specs

    if query not in all_specs():
        sys.exit(f"unknown query {query!r}: not in the registry (see OPERATORS.md)")
    floors, samples, preflight = [], [], []
    for _ in range(n):
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_BENCH_QUERIES=query,
            SPARK_GRAFT_BENCH_MAX_WAIT=os.environ.get(
                "SPARK_GRAFT_BENCH_MAX_WAIT", "120"
            ),
            # floors are WARM-protocol numbers by definition: never let
            # an inherited cold-mode flag flip the child harness (cold
            # payloads have no "samples" and are not comparable to the
            # recorded warm floors this tool attributes against)
            SPARK_GRAFT_BENCH_COLD="",
            # fresh-JVM JIT bias correction (bench.py n_warm comment):
            # 1-warmup isolated probes read ~2x suite-mode floors for
            # sub-second queries
            SPARK_GRAFT_BENCH_WARMUPS=os.environ.get(
                "SPARK_GRAFT_BENCH_WARMUPS", "4"
            ),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py")],
            env=env,
            cwd=_REPO,
            capture_output=True,
            text=True,
            timeout=600,
            check=True,
        )
        # since r10 bench.py emits TWO JSON lines: extended evidence
        # (carrying "samples") then the compact summary last. Select
        # them by CONTENT (the "metric" field), not position -- a stray
        # stdout line (late JVM/GC output, a future third record) must
        # not shift a positional index onto the wrong line (ADVICE r10)
        payload = extended = None
        for line in out.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            metric = rec.get("metric") if isinstance(rec, dict) else None
            if metric == "headline_suite_total":
                payload = rec
            elif metric == "headline_suite_extended":
                extended = rec
        if payload is None or extended is None:
            sys.exit(
                "bench.py output carried no headline_suite_total / "
                "headline_suite_extended JSON line:\n" + out.stdout
            )
        floors.append(payload["queries"][query])
        samples.append(extended["samples"][query])
        preflight.append(payload["loadavg_preflight"])
    print(
        json.dumps(
            {
                "query": query,
                "floors": floors,
                "best": min(floors),
                "samples": samples,
                "preflight": preflight,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
