"""spark.local.dir-on-tmpfs re-measurement (VERDICT r16 item 6), with
the order-balanced fresh-session protocol the r16 control demanded.

r16 adopted-then-reverted local.dir=/dev/shm after a reversed-order
control exposed a ~4% whoever-runs-SECOND bias in alternating
fresh-session pairs (page cache + JIT residue favor the later run);
the de-biased effect was ~1.03x on a contended window. This tool
settles it: each pair launches TWO fresh bench.py child processes
(one per configuration) and alternates which configuration goes first,
so the second-runner advantage cancels across pairs. Adoption bar per
the verdict: >= 1.05x de-biased median.

The candidate configuration sets SPARK_LOCAL_DIRS=/dev/shm/... (the
env-var spelling of spark.local.dir for local mode), which moves
shuffle files + disk-spill scratch to tmpfs. Shuffle files are never
fsynced, so the page cache already absorbs them on ext4 -- the r16
mechanism argument for why this knob, unlike the streaming-checkpoint
one (which fsyncs), should NOT matter.

Usage: python tools/r17_localdir.py [--pairs N] [--queries a,b,c]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: exchange-heavy headline subset: every one of these plans at least one
#: full shuffle (rollup two-level, LSH self-join + verify, curation
#: survivors window, left-join re-agg, debounce-style repartitions)
DEFAULT_QUERIES = (
    "agg_rollup,dedup_minhash_lsh,corpus_curation_pipeline,"
    "join_left_groupby,q1_pricing_summary,window_topk_per_group"
)


def one_run(local_dirs: str | None, queries: str) -> float | None:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_BENCH_QUERIES=queries,
        SPARK_GRAFT_BENCH_MAX_WAIT="5",
        SPARK_GRAFT_BENCH_WARMUPS="2",
        SPARK_GRAFT_BENCH_WOBBLE="0",
    )
    if local_dirs:
        env["SPARK_LOCAL_DIRS"] = local_dirs
    else:
        env.pop("SPARK_LOCAL_DIRS", None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=600, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])["value"]
    except Exception as e:  # noqa: BLE001
        print("run failed:", e, file=sys.stderr)
        return None


def main() -> int:
    args = sys.argv[1:]
    pairs = 8
    queries = DEFAULT_QUERIES
    if "--pairs" in args:
        i = args.index("--pairs")
        pairs = int(args[i + 1])
    if "--queries" in args:
        i = args.index("--queries")
        queries = args[i + 1]
    shm_base = tempfile.mkdtemp(prefix="etl_upc_localdir_", dir="/dev/shm")
    try:
        ratios = []
        rows = []
        for p in range(pairs):
            configs = [("base", None), ("tmpfs", shm_base)]
            if p % 2 == 1:
                configs.reverse()
            got: dict[str, float | None] = {}
            for name, ld in configs:
                got[name] = one_run(ld, queries)
            rows.append((p, configs[0][0], got["base"], got["tmpfs"]))
            if got["base"] and got["tmpfs"]:
                ratios.append(got["base"] / got["tmpfs"])
            print(
                f"pair {p}: first={configs[0][0]} base={got['base']} "
                f"tmpfs={got['tmpfs']}",
                flush=True,
            )
        ratios.sort()
        if ratios:
            med = ratios[len(ratios) // 2]
            print(json.dumps({
                "median_ratio_base_over_tmpfs": round(med, 3),
                "ratios": [round(r, 3) for r in ratios],
                "queries": queries,
                "pairs": pairs,
            }))
        return 0
    finally:
        shutil.rmtree(shm_base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
