"""Hostile-Unicode probe: non-ASCII text through the text/dedup family.

Every degenerate axis so far (zero-row, NULL, tiny, non-finite,
element-NULL, ragged) attacked NUMBERS or absence; this one attacks
the STRINGS. The fixtures' documents.text is pure ASCII word salad,
so the 53 document-reading oracle queries have never been compared
across engines on text where the engines' string models actually
differ: Spark executes Java/UTF-16 regex and unicode simple casing on
UTF8String, DuckDB executes RE2 over UTF-8 -- length semantics,
case-mapping edge cases (Turkish I, German sharp-s, Greek final
sigma), `\\s` coverage of exotic whitespace, and `.`-per-codepoint
behavior on astral-plane characters are all conventions that only
HOLD by measurement, not by spec.

Mutates documents.text at four spread doc_ids with eight hostile
classes (each mutant keeps common corpus words so joins/TF-IDF still
produce rows), recomputes the stored n_chars (= Python code-point
length, the generator's rule), then runs every document-reading
registry query against its DuckDB oracle with the test-grade compare.

Hostile classes injected:

- emoji + ZWJ family sequences + flag + skin-tone modifiers (astral
  code points, grapheme clusters spanning many code points);
- combining diacritics in NFD form (length vs visual length);
- casing edges: Turkish dotted capital I (U+0130), German eszett,
  Greek capital sigma (lowercases to final/medial forms contextually
  under FULL case mapping -- simple mapping differs);
- mathematical alphanumerics + CJK extension B (astral plane, `.`
  and length per code point vs per UTF-16 unit);
- zero-width characters INSIDE words (ZWSP/ZWJ/word joiner: token
  boundaries that look like none);
- no-break space BETWEEN words (U+00A0: not ASCII `\\s` -- do both
  tokenizers agree it is NOT a separator?);
- RTL runs with explicit directional marks;
- exotic ASCII whitespace (VT/FF/CRLF) as separators.

Output: one JSON line {"total": N, "ok": N, "diverged": {...},
"errored": {...}}. A divergence is a MEASURED posture to document or
fix, not automatically a bug (the nan_probe doctrine).

Usage: python tools/unicode_probe.py [--src SF_DIR] [--only NAME,..]
                                     [--normalize]
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

#: doc_id -> (label, hostile text). Common corpus words ("spark query
#: data merge table row") are kept in every mutant so join/TF-IDF
#: style queries still intersect the vocabulary.
UNICODE_MUTATIONS = {
    2: (
        "emoji_zwj",
        "spark \U0001F469‍\U0001F469‍\U0001F467‍\U0001F466 "
        "query \U0001F1FA\U0001F1F3 data \U0001F44D\U0001F3FD merge table row",
    ),
    12: (
        "combining_nfd_casing",
        "spark café query däta İstanbul STRASSE "
        "ΣΙΣΥΦΟΣ merge table row",
    ),
    30: (
        "astral_zero_width",
        "spark \U0001D566\U0001D566 \U0001D55A\U0001D55A \U0002070E "
        "que​ry da‍ta mer⁠ge query data table row",
    ),
    31: (
        "rtl_exotic_whitespace",
        "spark العربية "
        "עברית ‏query‎ data"
        " mergetablerow\r\nend",
    ),
}


def build_unicode_fixture(src_sf_dir: str, dest_dir: str) -> None:
    """Copy every fixture file; replace documents.text at the mutated
    ids and recompute the stored n_chars (code-point length -- the
    generator's rule, and DuckDB's length() semantics for the column
    consumers that read it)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)
    for name in TABLES:
        src = os.path.join(src_sf_dir, f"{name}.parquet")
        dst = os.path.join(dest_dir, f"{name}.parquet")
        if name != "documents":
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        new_texts = [
            UNICODE_MUTATIONS[i][1] if i in UNICODE_MUTATIONS else t
            for i, t in zip(ids, texts)
        ]
        t_idx = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(
            t_idx, "text", pa.array(new_texts, type=tbl.schema.field(t_idx).type)
        )
        n_idx = tbl.schema.get_field_index("n_chars")
        n_type = tbl.schema.field(n_idx).type
        tbl = tbl.set_column(
            n_idx,
            "n_chars",
            pa.array([len(t) if t is not None else None for t in new_texts], type=n_type),
        )
        pq.write_table(tbl, dst)


def normalize_fixture_text(spark, fixture_dir: str) -> None:
    """Rewrite documents.text through THE normalizer operator
    (textanalysis.norm_text_unicode -- never a Python re-implementation
    of the rule) and recompute n_chars, in place. This is the gate
    composition a hostile-text lake would run at ingestion; the probe's
    --normalize mode measures that it restores full cross-engine
    parity."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.operators.textanalysis import norm_text_unicode

    path = os.path.join(fixture_dir, "documents.parquet")
    normed = {
        r["doc_id"]: r["t"]
        for r in spark.read.parquet(path)
        .select("doc_id", norm_text_unicode("text").alias("t"))
        .collect()
    }
    tbl = pq.read_table(path)
    ids = tbl.column("doc_id").to_pylist()
    new_texts = [normed[i] for i in ids]
    t_idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(
        t_idx, "text", pa.array(new_texts, type=tbl.schema.field(t_idx).type)
    )
    n_idx = tbl.schema.get_field_index("n_chars")
    tbl = tbl.set_column(
        n_idx,
        "n_chars",
        pa.array(
            [len(t) if t is not None else None for t in new_texts],
            type=tbl.schema.field(n_idx).type,
        ),
    )
    pq.write_table(tbl, path)


def document_query_names(specs) -> list[str]:
    """Oracle queries whose SQL reads the documents table."""
    return sorted(
        n
        for n, s in specs.items()
        if s.oracle is not None and re.search(r"\bdocuments\b", s.oracle)
    )


def main(argv: list[str]) -> int:
    src = "/root/testdata/sf0.001"
    only = None
    normalize = False
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--src":
            src = args.pop(0)
        elif a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--normalize":
            normalize = True
        else:
            sys.exit(f"unknown arg {a!r}")

    from tests.oracle_harness import compare, duckdb_run

    spark = get_spark("unicode-probe")
    specs = all_specs()
    names = document_query_names(specs)
    if only:
        names = [n for n in names if n in only]

    dest = os.path.join(tempfile.gettempdir(), "etl_upc_unicodeprobe")
    build_unicode_fixture(src, dest)
    if normalize:
        normalize_fixture_text(spark, dest)

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
                "mode": "unicode-normalized" if normalize else "unicode",
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
