"""Malformed-JSON probe: hostile ``events.props`` payloads.

The fixtures' props column is uniformly well-formed ``{"k": N}``, so
the three JSON-reading oracle queries (``json_struct_extract``,
``variant_schema_on_read``, ``try_cast_quarantine`` -- the repo's own
malformed-input gate) have never been compared across engines on the
payloads a lake actually serves: truncated writes, non-JSON garbage,
duplicate keys (first-wins vs last-wins is a CLASSIC parser split),
numbers that overflow double, lone-surrogate escapes, trailing
garbage. Spark's ``from_json``/``parse_json`` and DuckDB's JSON
functions each choose silently-NULL vs loud-error vs value-coercion
per class -- conventions, not specs.

Mutates events.props at ten spread event_ids (one hostile class
each), then runs the JSON family with the test-grade compare. Output:
one JSON line per the probe convention.

Usage: python tools/json_probe.py [--src SF_DIR] [--only NAME,..]
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

#: event_id -> (label, hostile props string)
JSON_MUTATIONS = {
    5: ("truncated", '{"k": 8'),
    11: ("garbage", "not json at all"),
    17: ("wrong_type", '{"k": "text"}'),
    23: ("nested", '{"k": {"deep": 1}}'),
    29: ("empty_string", ""),
    35: ("bare_null", "null"),
    41: ("duplicate_keys", '{"k": 1, "k": 2}'),
    47: ("trailing_garbage", '{"k": 1}x'),
    53: ("overflow_number", '{"k": 1e999}'),
    59: ("lone_surrogate_escape", '{"k": "\\ud800"}'),
}


def build_json_fixture(src_sf_dir: str, dest_dir: str) -> None:
    """Copy every fixture file; replace events.props at the mutated ids."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)
    for name in TABLES:
        src = os.path.join(src_sf_dir, f"{name}.parquet")
        dst = os.path.join(dest_dir, f"{name}.parquet")
        if name != "events":
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        ids = tbl.column("event_id").to_pylist()
        props = tbl.column("props").to_pylist()
        new = [
            JSON_MUTATIONS[i][1] if i in JSON_MUTATIONS else p
            for i, p in zip(ids, props)
        ]
        p_idx = tbl.schema.get_field_index("props")
        pq.write_table(
            tbl.set_column(
                p_idx, "props", pa.array(new, type=tbl.schema.field(p_idx).type)
            ),
            dst,
        )


def json_query_names(specs) -> list[str]:
    return sorted(
        n
        for n, s in specs.items()
        if s.oracle is not None and re.search(r"\bprops\b", s.oracle)
    )


def main(argv: list[str]) -> int:
    src = "/root/testdata/sf0.001"
    only = None
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--src":
            src = args.pop(0)
        elif a == "--only":
            only = set(args.pop(0).split(","))
        else:
            sys.exit(f"unknown arg {a!r}")

    from tests.oracle_harness import compare, duckdb_run

    spark = get_spark("json-probe")
    specs = all_specs()
    names = json_query_names(specs)
    if only:
        names = [n for n in names if n in only]

    dest = os.path.join(tempfile.gettempdir(), "etl_upc_jsonprobe")
    build_json_fixture(src, dest)

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
                "mode": "malformed-json",
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
