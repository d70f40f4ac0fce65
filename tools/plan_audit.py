"""Regenerate the PLANS.md physical-plan audit table and diff it
against the committed one (the per-round zero-rows-changed receipt,
previously done ad hoc each round via
`python -m etl_upc_syllabus_spark.explain --audit` + a hand diff).

Usage: python tools/plan_audit.py [--sf DIR] [--cpus N]
Prints changed rows (old -> new) and a summary line; exit 0 when the
table is row-identical, 1 when any row changed / is new / is stale.

Same conditions as the committed table: the registry queries planned
(never executed) at $SPARK_GRAFT_SF_DIR (default sf0.01) on the
engine's own session factory.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
)
COLS = (
    "query counted_by shuffles broadcast_joins sortmerge_joins "
    "pushed_filters topk_no_sort python_stage"
).split()
_ROW_RX = re.compile(
    r"^\| (\w+) \| (node_id|checkpoint\+trivial|checkpointed|checkpoint_masked) \|"
)


def committed_rows() -> dict[str, list[str]]:
    rows = {}
    with open(PLANS, encoding="utf-8") as fh:
        for line in fh:
            if _ROW_RX.match(line):
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                rows[cells[0]] = cells
    return rows


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    args = sys.argv[1:]
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    if "--cpus" in args:
        cpus = args[args.index("--cpus") + 1]

    from etl_upc_syllabus_spark.explain import audit_row, plan_of
    from etl_upc_syllabus_spark.plans import all_specs
    from etl_upc_syllabus_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    old = committed_rows()
    changed = new_rows = 0
    specs = all_specs()
    names = sorted(specs)
    for name in names:
        row = audit_row(name, *plan_of(specs[name].fn(spark, sf)))
        new = [str(row[c]) for c in COLS]
        if name not in old:
            print(f"NEW (not in PLANS.md): | {' | '.join(new)} |")
            new_rows += 1
        elif old[name] != new:
            print(
                f"CHANGED {name}:\n  old | {' | '.join(old[name])} |"
                f"\n  new | {' | '.join(new)} |"
            )
            changed += 1
    stale = sorted(set(old) - set(names))
    for name in stale:
        print(f"STALE (in PLANS.md, not in registry): {name}")
    print(
        f"plan_audit: {len(names)} queries at {sf}, {changed} changed, "
        f"{new_rows} new, {len(stale)} stale"
    )
    return 1 if (changed or new_rows or stale) else 0


if __name__ == "__main__":
    sys.exit(main())
