"""Drop-in CLI parity: python -m etl_upc_syllabus_spark <in> <out>
produces the reference's artifacts (etl_courses.py + README.md
"Archivos generados") from real PDF bytes."""

from __future__ import annotations

import json
import os

from etl_upc_syllabus_spark.__main__ import main
from etl_upc_syllabus_spark.pipeline import minipdf

from .test_minipdf import ASSESSMENTS_TABLE, PAGE1, UNITS_TABLE


def test_cli_end_to_end(spark, tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "data"
    raw.mkdir()

    def pages(course):
        return [
            PAGE1.replace("Matemática Básica", course),
            ["VI. UNIDADES DE APRENDIZAJE", ("table", UNITS_TABLE)],
            ["VIII. EVALUACIÓN", ("table", ASSESSMENTS_TABLE)],
        ]

    minipdf.write_pdf(str(raw / "UG-202520_1AEL0244-8281.pdf"), pages("Matemática Básica"))
    minipdf.write_pdf(str(raw / "UG-202520_1AEL0321-9001.pdf"), pages("Física I"))
    (raw / "UG-202520_1AEL9999-0000.pdf").write_bytes(b"%PDF-1.4 garbage")
    (raw / "config.json").write_text(
        json.dumps({"2025-2": {"start_date": "2025-08-25", "end_date": "2025-12-06"}})
    )

    assert main([str(raw), str(out)]) == 0

    # reference artifact set: per-course '{name}-{nrc}.json', consolidated
    # array, calendar PDF -- plus the scale-path parquet corpus
    assert (out / "Matemática Básica-8281.json").exists()
    assert (out / "Física I-9001.json").exists()
    assert (out / "weekly_calendar.pdf").read_bytes()[:5] == b"%PDF-"
    assert os.path.isdir(out / "courses_parquet")

    courses = json.loads((out / "all_courses.json").read_text(encoding="utf-8"))
    assert sorted(c["id"] for c in courses) == ["1AEL0244", "1AEL0321"]
    # J1 enrichment ran (the reference's dead code, alive here): week 4 of a
    # 2025-08-25 period start is Monday 2025-09-15 .. Saturday 2025-09-20
    a0 = next(c for c in courses if c["id"] == "1AEL0244")["assessments"][0]
    assert (a0["initial_date"], a0["last_date"]) == ("2025-09-15", "2025-09-20")
