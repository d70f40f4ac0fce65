"""Hostile-axis probe for the reference-parity syllabus pipeline
(VERDICT r10 item 5).

The five r9/r10 probe tools all target the star-schema/embedding
fixtures; the P1-P7/C1 pipeline had golden tests on WELL-FORMED
documents only. This probe feeds the real parse surface
(pipeline.assemble.parse_documents -> split_quarantine, the same
Arrow stage every syllabus query runs) the hostile classes a real
document lake serves, and classifies each:

- **parity**: the hostile doc parses to the SAME record as its clean
  template (formatting hostility must be value-neutral), or the
  deviation is the documented reference contract (e.g. the P6
  short-row skip);
- **quarantine**: the doc lands in the error split -- the pipeline's
  DEFINED failure posture (P7);
- **SILENT**: error is NULL but the record differs from the clean
  template -- the class that looks parsed and is wrong. These get
  pins (tests/test_syllabus_hostile.py) so the posture is visible.

``--gated`` applies THE shipped operators (never a Python
re-implementation): pipeline.assemble.normalize_raw_docs (NFKC --
composes NFD combining forms, folds fullwidth punctuation and NBSP;
a no-op on clean Spanish text, which is already NFC), then
textanalysis.unicode_clean mapped over pages and table cells (format
chars strip, exotic whitespace unifies), and, for the
duplicate-filename class, curation.quarantine_duplicate_keys on the
parsed (id, nrc) key; then re-measures. Measured gated posture: ZERO
silent classes (every class parity, documented contract, quarantine,
or all-copies-quarantined -- tests/test_syllabus_hostile.py pins it).
The NFD / fullwidth classes that stay residual for the SQL-mirrored
text family (unicode_probe.py: no NFC on either engine's expression
surface) ARE closable here because this pipeline's parse stage is
already an Arrow/Python seam, where stdlib unicodedata is available.

Usage: python tools/syllabus_probe.py [--gated]
       python tools/syllabus_probe.py --bench N   # pre-pass throughput
Prints one posture row per class, then a JSON summary line.

``--bench N`` measures the NFKC pre-pass's scale cost: N synthetic
raw documents through parse_documents alone vs normalize_raw_docs ->
parse_documents, min-of-3 each, at N and 4N (the decade-style
linearity check for the new Arrow stage).
"""

from __future__ import annotations

import json
import os
import sys
import unicodedata

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NBSP = " "
ZWSP = "​"


def clean_doc(filename="UG-202520_1AEL0244-8281.pdf", name="Matemática Básica"):
    """The golden-test template (tests/test_pipeline_golden.py doc())."""
    pages = [
        "Sílabo de Curso\nI. INFORMACIÓN GENERAL\n"
        f"Nombre del Curso : {name}\n"
        "Cuerpo académico : Ana Pérez, Luis Díaz\n"
        "Créditos : 4\nSemanas : 16\n"
        "II. MISIÓN Y VISIÓN DE LA UPC\n...",
    ]
    units_table = [
        ["Unidad n. 1: Fundamentos", "", "", "", ""],
        ["COMPETENCIA (S): base", "", "", "", ""],
        ["LOGRO DE LA UNIDAD: domina lo básico", "", "", "", ""],
        ["SEMANA", "TEMARIO", "ACTIVIDADES", "EVALUACIONES", "BIBLIOGRAFÍA"],
        ["Semana 1 - 8", "• t1 • t2", "• a1", "• e1", "• b1"],
    ]
    assessments_table = [
        ["TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE"],
        ["PRÁCTICA PC - 1", "g1", "15%", "4", "", "Sí"],
        ["EXAMEN FINAL - 1", "g1", "85%", "16", "", "No"],
    ]
    return [filename, pages, units_table, assessments_table]


def _edit_page(doc, fn):
    doc[1] = [fn(p) for p in doc[1]]
    return doc


#: class -> (mutator(clean_doc) -> hostile_doc, expected-change note).
#: Every mutation except the dup/ragged-contract classes is PURE
#: FORMATTING: a correct pipeline parses the mutant to the clean
#: template's record.
def mutations():
    def nbsp_header(d):
        return _edit_page(d, lambda p: p.replace(
            "I. INFORMACIÓN GENERAL", f"I.{NBSP}INFORMACIÓN{NBSP}GENERAL"))

    def nfd_header(d):
        return _edit_page(d, lambda p: p.replace(
            "INFORMACIÓN", unicodedata.normalize("NFD", "INFORMACIÓN")))

    def nbsp_after_bullet(d):
        d[2] = [[c.replace("• ", f"•{NBSP}") for c in r] for r in d[2]]
        return d

    def zwsp_in_marker(d):
        d[2] = [
            [c.replace("Unidad n.", f"Unidad{ZWSP} n.") if i == 0 else c
             for i, c in enumerate(r)]
            for r in d[2]
        ]
        return d

    def fullwidth_colon(d):
        return _edit_page(d, lambda p: p.replace(
            "Nombre del Curso :", "Nombre del Curso ："))

    def nfd_recoverable(d):
        d[3] = [[unicodedata.normalize("NFD", c) for c in r] for r in d[3]]
        return d

    def assess_short_row(d):
        d[3] = d[3] + [["TRABAJO - 2", "g1", "10%"]]  # 3 cells < guard 4
        return d

    def units_empty_row(d):
        d[2] = d[2][:4] + [[]] + d[2][4:]
        return d

    def units_overlong_row(d):
        d[2] = d[2] + [["extra continuation", "", "", "", "", "spill", "over"]]
        return d

    def week_cells_missing(d):
        d[2] = d[2][:4] + [["Semana 1 - 8", "• t1 • t2"]]
        return d

    return {
        "nbsp_in_header": nbsp_header,
        "nfd_header": nfd_header,
        "nbsp_after_bullet": nbsp_after_bullet,
        "zwsp_in_unit_marker": zwsp_in_marker,
        "fullwidth_colon_label": fullwidth_colon,
        "nfd_recoverable_flag": nfd_recoverable,
        "assess_short_row": assess_short_row,
        "units_empty_row": units_empty_row,
        "units_overlong_row": units_overlong_row,
        "week_cells_missing": week_cells_missing,
    }


#: classes whose deviation from the clean record is the DOCUMENTED
#: contract, not silence: class -> what the contract says.
CONTRACT_DEVIATIONS = {
    # P6: rows under 4 cells are skipped warn-style like the reference
    # (etl_pipeline.py:281) -- the extra short row must change nothing.
    "assess_short_row": "parity (P6 short-row skip is the contract)",
    # missing trailing week cells default to empty lists (the
    # len(cells) > k guards in _parse_week_row) -- same record minus
    # the absent cells' content.
    "week_cells_missing": "parity-degrade (absent cells -> empty lists)",
}


def gate_unicode(raw):
    """THE shipped operators over every text surface of the raw
    document frame: NFKC pre-pass (pipeline.assemble.normalize_raw_docs
    -- composes NFD, folds fullwidth punctuation and NBSP) then
    textanalysis.unicode_clean (strips format chars like ZWSP)."""
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.operators.textanalysis import unicode_clean
    from etl_upc_syllabus_spark.pipeline.assemble import normalize_raw_docs

    raw = normalize_raw_docs(raw)
    return (
        raw.withColumn("pages", F.transform("pages", unicode_clean))
        .withColumn(
            "units_table",
            F.transform("units_table", lambda r: F.transform(r, unicode_clean)),
        )
        .withColumn(
            "assessments_table",
            F.transform("assessments_table", lambda r: F.transform(r, unicode_clean)),
        )
    )


def record_of(good_df):
    rows = good_df.collect()
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append(json.dumps(d, sort_keys=True, ensure_ascii=False, default=str))
    return sorted(out)


def bench(n: int) -> int:
    import time

    from etl_upc_syllabus_spark.pipeline.assemble import (
        normalize_raw_docs,
        parse_documents,
    )
    from etl_upc_syllabus_spark.pipeline.schema import RAW_DOC_SCHEMA
    from etl_upc_syllabus_spark.session import get_spark

    spark = get_spark("syllabus-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for size in (n, 4 * n):
        docs = [
            tuple(clean_doc(filename=f"UG-202520_{i:08d}-{i % 10000:04d}.pdf"))
            for i in range(size)
        ]
        raw = spark.createDataFrame(docs, RAW_DOC_SCHEMA).repartition(32)
        raw = raw.localCheckpoint()  # exclude fixture build from timing
        res = {}
        for label, pipe in [
            ("parse_only", lambda: parse_documents(raw)),
            ("nfkc_then_parse", lambda: parse_documents(normalize_raw_docs(raw))),
            # r12: the fused single-Arrow-pass knob (VERDICT r11 item 5)
            ("parse_nfkc_fused", lambda: parse_documents(raw, nfkc=True)),
        ]:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pipe().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            res[label] = round(best, 3)
        res["overhead_pct"] = round(
            100 * (res["nfkc_then_parse"] / res["parse_only"] - 1), 1
        )
        res["fused_overhead_pct"] = round(
            100 * (res["parse_nfkc_fused"] / res["parse_only"] - 1), 1
        )
        print(json.dumps({"n_docs": size, **res}), flush=True)
    spark.stop()
    return 0


def main(argv):
    if "--bench" in argv:
        return bench(int(argv[argv.index("--bench") + 1]))
    gated = "--gated" in argv
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.pipeline.assemble import parse_documents, split_quarantine
    from etl_upc_syllabus_spark.pipeline.schema import RAW_DOC_SCHEMA
    from etl_upc_syllabus_spark.session import get_spark

    spark = get_spark("syllabus-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run_pipeline(docs):
        raw = spark.createDataFrame([tuple(d) for d in docs], RAW_DOC_SCHEMA)
        if gated:
            raw = gate_unicode(raw)
        good, bad = split_quarantine(parse_documents(raw))
        return record_of(good), [(r["id"], r["error"]) for r in bad.collect()]

    baseline, _ = run_pipeline([clean_doc()])
    results = {}
    for cls, mut in mutations().items():
        good, bad = run_pipeline([mut(clean_doc())])
        if bad:
            posture = "quarantine"
            detail = bad[0][1][:80]
        elif good == baseline:
            posture = "parity"
            detail = ""
        else:
            posture = CONTRACT_DEVIATIONS.get(cls, "SILENT")
            a = json.loads(baseline[0]) if baseline else {}
            b = json.loads(good[0]) if good else {}
            detail = ",".join(
                sorted(k for k in set(a) | set(b) if a.get(k) != b.get(k))
            )[:80]
        results[cls] = {"posture": posture, "detail": detail}
        print(f"{cls:26s} {posture:44s} {detail}", flush=True)

    # duplicate-filename axis: two uploads of the same {id}-{nrc}
    docs = [clean_doc(), clean_doc(name="Matemática Básica (corregido)")]
    raw = spark.createDataFrame([tuple(d) for d in docs], RAW_DOC_SCHEMA)
    good, bad = split_quarantine(parse_documents(raw))
    if gated:
        from etl_upc_syllabus_spark.operators.curation import quarantine_duplicate_keys

        keyed = good.withColumn("_k", F.concat_ws("-", "id", "nrc"))
        clean_side, quar = quarantine_duplicate_keys(keyed, "_k")
        n_clean, n_quar = clean_side.count(), quar.count()
        posture = "gated: all copies quarantined" if (n_clean, n_quar) == (0, 2) \
            else f"gated UNEXPECTED clean={n_clean} quar={n_quar}"
        results["dup_id_nrc"] = {"posture": posture, "detail": ""}
    else:
        n, n_bad = good.count(), bad.count()
        posture = (
            "SILENT (both copies parse clean; every point read / calendar "
            "double-counts)" if (n, n_bad) == (2, 0) else f"unexpected n={n} bad={n_bad}"
        )
        results["dup_id_nrc"] = {"posture": posture, "detail": f"rows={n}"}
    print(f"{'dup_id_nrc':26s} {results['dup_id_nrc']['posture']}", flush=True)

    n_silent = sum(1 for v in results.values() if v["posture"].startswith("SILENT"))
    print(json.dumps({
        "probe": "syllabus_hostile", "gated": gated,
        "classes": len(results), "silent": n_silent,
        "postures": {k: v["posture"] for k, v in results.items()},
    }, ensure_ascii=False))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
