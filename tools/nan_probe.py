"""Non-finite-embedding probe: NaN / +-Infinity through the ANN family.

The r8 degenerate sweeps covered zero-row, NULL-payload, and tiny
corpora -- but never NON-FINITE floats, which real embedding pipelines
do produce (fp16 overflow at export, 0/0 in a broken normalizer).
NaN is hostile in a way NULL is not: it is a VALUE, so NULL guards do
not catch it, it poisons every arithmetic expression it touches, and
the two engines' orderings only agree by convention (both Spark and
DuckDB sort NaN greater than every other double -- a convention this
probe verifies rather than assumes).

Builds a fixture from --src (default sf0.001) where the embeddings
table carries, at ids chosen to hit every role in the prefix-seed
convention (codebook member, query, corpus candidate):

- one vector with a single NaN element,
- one all-NaN vector,
- one vector with a +Infinity element,
- one with -Infinity,

then runs every embedding-reading registry query against its DuckDB
oracle with the test-grade compare. Output: one JSON line
{"total": N, "ok": N, "diverged": {...}, "errored": {...}}.

A divergence here is NOT automatically a bug to fix -- the engine's
documented contract (OPERATORS.md / similarity.py) is that embeddings
are finite; the probe's job is to turn "undefined behavior" into a
MEASURED posture (identical garbage, divergent garbage, or crash) so
the contract line in the docs is evidence, not hope.

Three modes (--mode):

- ``nan`` (default): true NaN / +-Infinity elements in embeddings --
  measured 11/11 cross-engine parity (r9, re-confirmed r10);
- ``elemnull``: NULL elements inside non-NULL vectors -- r9 measured
  loud-crash (PQ family) / divergent (dot products) UB; the r10
  element-level indexability contract (similarity.indexable +
  dims_cte's list_filter guard) turned it into 11/11 parity, pinned
  in tests/test_nonfinite_embeddings.py;
- ``events``: NaN / +-Inf in the scalar ``events.value`` -- 32/38
  parity since r10 (grouped_map_rank's pandas seam now ranks NaN
  first like SQL), all 6 residuals loud (BASELINE.md r9 section);
  the consequence operator is curation.quarantine_nonfinite.
- ``ragged`` (new r10): vectors of NON-UNIFORM width (truncated /
  overlong / empty / singleton at the contract-critical ids) --
  measured 1/11 ok, 6 silently diverged (Spark zip_with NULL-pads the
  short side and null-propagates; the SQL dims join silently computes
  PARTIAL dot products over shared indices), 4 loud driver-side
  IndexErrors (LUT build indexes a truncated codebook seed past its
  end). Documented UB: the ANN contract is fixed-width input; the
  consequence operator is curation.quarantine_vector_width (registry
  plans deliberately untouched -- frozen cohorts). ``--gated``
  (applies the width gate, dropping the 4 mutated rows) measures the
  restored posture: 6/11 full parity + 5 LOUD ValueErrors, 0 silent
  -- the PQ family's prefix-seed convention correctly refuses a
  corpus whose seed id was removed ("codebook ids missing"); a
  production deployment passes a trained codebook via cents= and is
  unaffected by which ids the gate drops.

Usage: python tools/nan_probe.py [--mode nan|elemnull|events|ragged]
                                 [--src SF_DIR] [--only NAME,..]
                                 [--gated]  (ragged: apply the width
                                 gate first; measures parity restored)
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_upc_syllabus_spark.plans import all_specs
from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.tables import TABLES

#: ids mutated, chosen against the prefix-seed conventions: 2 sits in
#: every prefix codebook (kc>=4) AND the PQ/IVF seed range; 12 is a
#: query under every query_pred in use ([10,20) / <10 / <50); 30 is a
#: plain corpus candidate; 31 carries the second non-finite class.
MUTATIONS = {
    2: ("one_nan", lambda v: [float("nan")] + v[1:]),
    12: ("all_nan", lambda v: [float("nan")] * len(v)),
    30: ("pos_inf", lambda v: [float("inf")] + v[1:]),
    31: ("neg_inf", lambda v: [float("-inf")] + v[1:]),
}

#: event_ids whose scalar ``value`` goes non-finite in --table events
#: (spread across users/types so windows, sessions, and funnels all
#: see one).
EVENT_MUTATIONS = {
    5: float("nan"),
    17: float("inf"),
    29: float("-inf"),
}

#: ragged-width mutations (--mode ragged): parquet list columns are
#: not fixed-width -- a writer bug or schema drift can legally land
#: vectors of DIFFERENT lengths in one corpus. Hostile in a new way:
#: Spark's zip_with pads the SHORTER side with NULL (re-entering the
#: null-propagation class the element-NULL contract closed, through a
#: different door) while the oracle's dims join only matches SHARED
#: indices (silent partial dot products). Same contract-critical ids
#: as MUTATIONS: a codebook seed, a query, two corpus candidates.
RAGGED_MUTATIONS = {
    2: ("truncated_half", lambda v: v[: len(v) // 2]),
    12: ("overlong_1p5x", lambda v: v + v[: len(v) // 2]),
    30: ("empty", lambda v: []),
    31: ("singleton", lambda v: v[:1]),
}


def build_nonfinite_fixture(
    src_sf_dir: str, dest_dir: str, mode: str = "nan"
) -> None:
    """Copy every fixture file; inject hostile elements into
    embeddings. Single-FILE parquet via pyarrow (not a Spark directory
    write): the DuckDB oracle side reads ``{table}.parquet`` as one
    file, exactly like the real fixtures.

    The embedding column is rebuilt as an EXPLICIT pyarrow array of
    the source element type -- a pandas round-trip silently coerces
    NaN to element-NULL at Table.from_pandas (discovered by this
    probe's first run), which is mode "elemnull", a distinct hostile
    class parquet genuinely allows: a non-NULL vector with NULL
    elements.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)  # stale dir-layout leftovers break copyfile
    os.makedirs(dest_dir)
    target = "events" if mode == "events" else "embeddings"
    for name in TABLES:
        src = os.path.join(src_sf_dir, f"{name}.parquet")
        dst = os.path.join(dest_dir, f"{name}.parquet")
        if name != target:
            # fixtures may be single files OR table-as-directory
            # layouts (events.parquet/ of part files, supported since
            # r8) -- copy whichever shape is on disk
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
            continue
        if name == "events":
            tbl = pq.read_table(src)
            v_idx = tbl.schema.get_field_index("value")
            ids = tbl.column("event_id").to_pylist()
            vals = tbl.column("value").to_pylist()
            new = [EVENT_MUTATIONS.get(i, v) for i, v in zip(ids, vals)]
            col = pa.array(new, type=tbl.schema.field(v_idx).type)
            pq.write_table(tbl.set_column(v_idx, "value", col), dst)
            continue
        tbl = pq.read_table(src)
        emb_idx = tbl.schema.get_field_index("embedding")
        emb_type = tbl.schema.field(emb_idx).type
        ids = tbl.column("vec_id").to_pylist()
        vecs = tbl.column("embedding").to_pylist()
        out = []
        muts = RAGGED_MUTATIONS if mode == "ragged" else MUTATIONS
        for vid, vec in zip(ids, vecs):
            mut = muts.get(vid)
            if mut is not None:
                vec = mut[1]([float(x) for x in vec])
                if mode == "elemnull":
                    vec = [None if (x is not None and not math.isfinite(x)) else x
                           for x in vec]
            out.append(vec)
        new_col = pa.array(out, type=emb_type)
        pq.write_table(tbl.set_column(emb_idx, "embedding", new_col), dst)


def gate_fixture_widths(spark, fixture_dir: str) -> None:
    """Physically drop the rows THE GATE quarantines
    (curation.quarantine_vector_width -- never a Python
    re-implementation of the rule) from the embeddings fixture, in
    place. ``--mode ragged --gated`` then measures that the gate's
    clean side restores full cross-engine parity."""
    import pyarrow.parquet as pq

    from etl_upc_syllabus_spark.operators.curation import quarantine_vector_width

    path = os.path.join(fixture_dir, "embeddings.parquet")
    emb = spark.read.parquet(path)
    _clean, quar = quarantine_vector_width(emb)
    bad = {r["vec_id"] for r in quar.select("vec_id").collect()}
    tbl = pq.read_table(path)
    mask = [v not in bad for v in tbl.column("vec_id").to_pylist()]
    pq.write_table(tbl.filter(mask), path)


def embedding_query_names(specs) -> list[str]:
    return sorted(
        n
        for n, s in specs.items()
        if ("similarity" in s.tags or "embedding" in n or n == "dedup_embedding_cosine")
        and s.oracle is not None
    )


def events_query_names(specs) -> list[str]:
    """Oracle queries whose SQL reads the events table (the scalar
    ``value`` column is the only other float surface in the fixtures)."""
    import re as _re

    return sorted(
        n
        for n, s in specs.items()
        if s.oracle is not None and _re.search(r"\bevents\b", s.oracle)
    )


def main(argv: list[str]) -> int:
    src = "/root/testdata/sf0.001"
    only = None
    mode = "nan"
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
        elif a == "--mode":
            mode = args.pop(0)
            assert mode in ("nan", "elemnull", "events", "ragged"), mode
        else:
            sys.exit(f"unknown arg {a!r}")

    from tests.oracle_harness import compare, duckdb_run

    spark = get_spark("nan-probe")
    specs = all_specs()
    names = events_query_names(specs) if mode == "events" else embedding_query_names(specs)
    if only:
        names = [n for n in names if n in only]

    dest = os.path.join(tempfile.gettempdir(), "etl_upc_nanprobe")
    build_nonfinite_fixture(src, dest, mode=mode)
    if gated:
        assert mode == "ragged", "--gated applies the width gate (ragged mode)"
        gate_fixture_widths(spark, dest)

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
                "mode": f"{mode}-gated" if gated else mode,
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
