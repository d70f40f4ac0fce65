"""Duplicate-key probe: non-unique ids through the query families.

Every prior hostile axis attacked values (non-finite, NULL elements,
ragged widths, hostile strings); this one attacks IDENTITY. Nothing
in parquet enforces key uniqueness -- a retried writer task, an
at-least-once ingest, or a bad merge legally lands two rows with the
same vec_id/doc_id/event_id -- and the engine's determinism fences
(row_number tiebreaks by id, {id: value} driver-side dicts, "min id
is the keeper" conventions) all quietly ASSUME ids are unique.

Two hazards, measured separately:

1. **Cross-engine divergence**: driver-side collects that build
   {id: vector} dicts (the PQ/ADC prefix codebook) silently keep ONE
   arbitrary row per duplicated id, while the SQL oracle's relational
   join keeps BOTH -- so a duplicated codebook-seed id diverges (and
   nondeterministically, the dict winner depends on collect order).
2. **Within-engine nondeterminism**: row_number(ORDER BY x, id)
   tiebreaks stop being total orders when id duplicates carry
   different payloads at equal x.

Fixture (from --src, default sf0.001): one duplicated id per role --
a PQ/IVF codebook seed (vec_id 2, DIFFERENT vector), a query id
(vec_id 12, IDENTICAL vector -- the benign full-duplicate case), a
document (doc_id 7, different text), an event (event_id 17,
different value). Runs each id's query family against its DuckDB
oracle with the test-grade compare. Output: one JSON line per the
nan_probe convention.

The consequence operator is curation.quarantine_duplicate_keys: all
rows of a duplicated key are quarantined (the engine cannot know
which one is true), published with the copy count. ``--gated``
applies it to every mutated table first and measures the restored
posture.

Usage: python tools/dupkey_probe.py [--src SF_DIR] [--only NAME,..]
                                    [--gated]
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_upc_syllabus_spark.plans import all_specs
from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.tables import TABLES

#: (table, key column, duplicated id, payload mutation) -- mutation
#: maps the original row dict to the DUPLICATE row's dict
DUPLICATIONS = {
    "embeddings": (
        "vec_id",
        [
            # codebook seed, DIFFERENT vector: the dict-collect hazard
            (2, lambda row: {**row, "embedding": [float(-x) for x in row["embedding"]]}),
            # query id, IDENTICAL row: the benign full-duplicate case
            (12, lambda row: dict(row)),
        ],
    ),
    "documents": (
        "doc_id",
        [(7, lambda row: {**row, "text": (row["text"] or "") + " duplicated row payload"})],
    ),
    "events": (
        "event_id",
        [(17, lambda row: {**row, "value": (row["value"] or 0.0) + 999.0})],
    ),
}


def build_dupkey_fixture(src_sf_dir: str, dest_dir: str) -> None:
    """Copy every fixture file; append duplicate-id rows per
    DUPLICATIONS. n_chars is recomputed for the duplicated document
    (the generator's rule)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)
    for name in TABLES:
        src = os.path.join(src_sf_dir, f"{name}.parquet")
        dst = os.path.join(dest_dir, f"{name}.parquet")
        if name not in DUPLICATIONS:
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
            continue
        key, muts = DUPLICATIONS[name]
        tbl = pq.read_table(src)
        rows = tbl.to_pylist()
        by_id = {r[key]: r for r in rows}
        for dup_id, mut in muts:
            new = mut(dict(by_id[dup_id]))
            if name == "documents":
                new["n_chars"] = len(new["text"]) if new["text"] is not None else None
            rows.append(new)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=tbl.schema), dst
        )


def gate_fixture_keys(spark, fixture_dir: str) -> None:
    """Drop the rows THE GATE quarantines
    (curation.quarantine_duplicate_keys -- never a Python
    re-implementation) from each mutated table, in place."""
    import pyarrow.parquet as pq

    from etl_upc_syllabus_spark.operators.curation import quarantine_duplicate_keys

    for name, (key, _muts) in DUPLICATIONS.items():
        path = os.path.join(fixture_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        _clean, quar = quarantine_duplicate_keys(df, key)
        bad = {r[key] for r in quar.select(key).collect()}
        tbl = pq.read_table(path)
        mask = [v not in bad for v in tbl.column(key).to_pylist()]
        pq.write_table(tbl.filter(mask), path)


def affected_query_names(specs) -> list[str]:
    """Oracle queries reading any mutated table."""
    pat = re.compile(r"\b(embeddings|documents|events)\b")
    return sorted(
        n for n, s in specs.items() if s.oracle is not None and pat.search(s.oracle)
    )


def main(argv: list[str]) -> int:
    src = "/root/testdata/sf0.001"
    only = None
    gated = False
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--src":
            src = args.pop(0)
        elif a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--gated":
            gated = True
        else:
            sys.exit(f"unknown arg {a!r}")

    from tests.oracle_harness import compare, duckdb_run

    spark = get_spark("dupkey-probe")
    specs = all_specs()
    names = affected_query_names(specs)
    if only:
        names = [n for n in names if n in only]

    dest = os.path.join(tempfile.gettempdir(), "etl_upc_dupkeyprobe")
    build_dupkey_fixture(src, dest)
    if gated:
        gate_fixture_keys(spark, dest)

    ok, diverged, errored = [], {}, {}
    for name in names:
        t0 = time.time()
        try:
            sdf = specs[name].fn(spark, dest)
            odf = duckdb_run(specs[name].oracle, dest)
            compare(sdf, odf, name)
            ok.append(name)
        except AssertionError as exc:
            diverged[name] = str(exc)[:300]
        except Exception as exc:  # noqa: BLE001 -- survey, not assert
            errored[name] = f"{type(exc).__name__}: {str(exc)[:300]}"
        print(f"  {name}: {time.time() - t0:.1f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "mode": "dupkey-gated" if gated else "dupkey",
                "total": len(names),
                "ok": len(ok),
                "diverged": diverged,
                "errored": errored,
            }
        )
    )
    return 0 if len(ok) == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
