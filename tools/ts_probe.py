"""Extreme-timestamp probe: calendar edge cases through the events family.

The TZ/locale sweeps (r8) proved results are invariant to the
ENVIRONMENT's clock; this probe attacks the VALUES. Timestamps far
outside the fixtures' 2024 neighborhood are legal parquet and real in
lakes (epoch-zero sentinels, 9999-12-31 "forever" rows, fat-fingered
year 209 instead of 2009) and cross three engine seams that only
agree by measurement:

- **parquet rebase**: Spark rebases pre-1900-ish INT96/micros values
  between Julian-hybrid and proleptic-Gregorian calendars depending on
  spark.sql.parquet.datetimeRebaseModeInRead (EXCEPTION by default for
  ancient values written by unknown writers) -- a read that *raises*
  on a value DuckDB reads happily;
- **the 1582 Gregorian cutover gap** (Oct 5-14, 1582 never existed in
  the hybrid calendar): proleptic engines accept it, hybrid paths
  shift it by 10 days;
- **formatting/extraction width**: year()/strftime of years < 1000
  and = 9999, negative epochs (pre-1970), and epoch_us arithmetic at
  the extremes.

Mutates events.ts at four spread event_ids (epoch sentinel 1970-01-01,
pre-Gregorian 1582-10-05 inside the gap, ancient 0500-02-28, forever
9999-12-31) plus a pre-1970 negative-epoch value, then runs every
events-reading oracle query with the test-grade compare. Output: one
JSON line per the nan_probe convention.

Usage: python tools/ts_probe.py [--src SF_DIR] [--only NAME,..]
                                [--gated]
"""

from __future__ import annotations

import datetime as dt
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

#: event_id -> (label, replacement UTC timestamp)
TS_MUTATIONS = {
    5: ("epoch_zero", dt.datetime(1970, 1, 1, 0, 0, 0)),
    17: ("gregorian_gap_1582", dt.datetime(1582, 10, 5, 12, 0, 0)),
    29: ("ancient_0500", dt.datetime(500, 2, 28, 23, 59, 59)),
    41: ("forever_9999", dt.datetime(9999, 12, 31, 23, 59, 59)),
    53: ("pre_epoch_1969", dt.datetime(1969, 12, 31, 23, 59, 59)),
}


def build_ts_fixture(src_sf_dir: str, dest_dir: str) -> None:
    """Copy every fixture file; replace events.ts at the mutated ids
    (timestamp[us], the fixtures' physical type)."""
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
        ts = tbl.column("ts").to_pylist()
        new = [TS_MUTATIONS[i][1] if i in TS_MUTATIONS else t for i, t in zip(ids, ts)]
        t_idx = tbl.schema.get_field_index("ts")
        pq.write_table(
            tbl.set_column(
                t_idx, "ts", pa.array(new, type=tbl.schema.field(t_idx).type)
            ),
            dst,
        )


def gate_fixture_ts(spark, fixture_dir: str) -> None:
    """Drop the rows THE GATE quarantines
    (curation.quarantine_timestamp_range, default bounds -- never a
    Python re-implementation) from the events fixture, in place."""
    import pyarrow.parquet as pq

    from etl_upc_syllabus_spark.operators.curation import quarantine_timestamp_range

    path = os.path.join(fixture_dir, "events.parquet")
    ev = spark.read.parquet(path)
    _clean, quar = quarantine_timestamp_range(ev)
    bad = {r["event_id"] for r in quar.select("event_id").collect()}
    tbl = pq.read_table(path)
    mask = [v not in bad for v in tbl.column("event_id").to_pylist()]
    pq.write_table(tbl.filter(mask), path)


def events_query_names(specs) -> list[str]:
    return sorted(
        n
        for n, s in specs.items()
        if s.oracle is not None and re.search(r"\bevents\b", s.oracle)
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

    spark = get_spark("ts-probe")
    specs = all_specs()
    names = events_query_names(specs)
    if only:
        names = [n for n in names if n in only]

    dest = os.path.join(tempfile.gettempdir(), "etl_upc_tsprobe")
    build_ts_fixture(src, dest)
    if gated:
        gate_fixture_ts(spark, dest)

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
                "mode": "extreme-ts-gated" if gated else "extreme-ts",
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
