"""Pure-Python tests for the parse kernels (no Spark needed) --
SURVEY.md section 5 item 3: C1 branches, F1 variants, P1 accept/reject,
F4/F5 coercion defaults."""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.pipeline import parse as P


# ---- P1: filename metadata -------------------------------------------------


def test_filename_ok():
    meta = P.parse_filename("UG-202520_1AEL0244-8281.pdf")
    assert meta == {"id": "1AEL0244", "nrc": "8281", "period": "2025-2"}


@pytest.mark.parametrize(
    "bad",
    [
        "UG-20252_1AEL0244-8281.pdf",  # period not 5 digits before the literal 0
        "XX-202520_1AEL0244-8281.pdf",  # wrong prefix
        "UG-202520_SHORT-8281.pdf",  # id not 8 chars
        "UG-202520_1AEL0244-828.pdf",  # nrc not 4 digits
        "UG-202520_1AEL0244-8281.txt",  # wrong extension
    ],
)
def test_filename_rejects(bad):
    with pytest.raises(ValueError):
        P.parse_filename(bad)


# ---- F1: bullet split, both delimiter variants ------------------------------


def test_bullets_with_comma_variant():
    assert P.split_bullets("a, b •c  d", include_comma=True) == ["a", "b", "c", "d"]


def test_bullets_without_comma_variant():
    assert P.split_bullets("a, b •c  d", include_comma=False) == ["a, b", "c", "d"]


# ---- P2/P3/F5: general info ------------------------------------------------

PAGES = [
    "Sílabo de Curso\nI. INFORMACIÓN GENERAL\n"
    "Nombre del Curso : Matemática Básica\n"
    "Código del curso : 1AEL0244\n"
    "Periodo : 2025-2\n"
    "Cuerpo académico : Ana Pérez, Luis Díaz\n"
    "Créditos : 4\n"
    "Semanas : 16\n"
    "NRC : 8281\n"
    "Carreras\n: Ingeniería Civil, Ingeniería Industrial\nÁrea o programa Ciencias\n"
    "II. MISIÓN Y VISIÓN DE LA UPC\nshould not leak",
]


def test_general_info_extraction():
    info = P.parse_general_info(PAGES)
    assert info["name"] == "Matemática Básica"
    assert info["id"] == "1AEL0244"
    assert info["period"] == "2025-2"
    assert info["faculty"] == ["Ana Pérez", "Luis Díaz"]
    assert info["credits"] == 4 and info["weeks"] == 16 and info["nrc"] == 8281
    assert info["areas"] == ["Ingeniería Civil", "Ingeniería Industrial Ciencias"]


def test_general_info_coercion_defaults():
    pages = [
        "I. INFORMACIÓN GENERAL\nCréditos : cuatro\nSemanas : dieciséis\nNRC : none\n"
        "II. MISIÓN Y VISIÓN"
    ]
    info = P.parse_general_info(pages)
    assert info["credits"] == 0  # bad int -> 0 (etl_infrastructure.py:110-113)
    assert info["weeks"] == 16  # bad int -> 16 (:115-118)
    assert info["nrc"] == 0  # bad int -> 0  (:129-133)


def test_general_info_missing_section():
    info = P.parse_general_info(["no section markers here"])
    assert info["name"] == "" and info["faculty"] == [] and info["areas"] == []


# ---- C1: units-table repair state machine -----------------------------------


def unit_rows(n=1, title="Álgebra"):
    rows = []
    for k in range(1, n + 1):
        rows += [
            [f"Unidad n. {k}: {title} {k}", "", "", "", ""],
            ["COMPETENCIA (S): razonamiento", "", "", "", ""],
            ["LOGRO DE LA UNIDAD: resuelve sistemas", "", "", "", ""],
            ["SEMANA", "TEMARIO", "ACTIVIDADES", "EVALUACIONES", "BIBLIOGRAFÍA"],
            [f"Semana {2 * k - 1} - {2 * k}", "• t1 • t2", "• a1", "• e1", "• b1"],
        ]
    return rows


def test_repair_valid_passthrough():
    rows = unit_rows(2)
    assert P.repair_units_table(rows) == rows


def test_repair_merges_split_rows():
    rows = unit_rows(1)
    # split the LOGRO row across two physical rows (PDF cell overflow)
    rows[2:3] = [["LOGRO DE LA UNIDAD: resuelve", "", "", "", ""], ["sistemas", "", "", "", ""]]
    repaired = P.repair_units_table(rows)
    assert len(repaired) == 5
    assert repaired[2][0] == "LOGRO DE LA UNIDAD: resuelve sistemas"


def test_repair_merges_week_continuation():
    rows = unit_rows(1)
    rows.append(["", "• t3", "", "", ""])  # continuation of the Semana row
    repaired = P.repair_units_table(rows)
    assert len(repaired) == 5
    assert "t3" in repaired[4][1]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda r: r.__setitem__(0, ["Unidad 1: sin punto", "", "", "", ""]),  # bad title
        lambda r: r.__setitem__(1, ["COMPETENCIA: falta (S)", "", "", "", ""]),  # bad competencia
        lambda r: r.__setitem__(4, ["Lunes 1 - 2", "", "", "", ""]),  # bad week data row
        # trailing junk before EOF hits the explicit raise branches
        lambda r: r.append(["fin de tabla", "", "", "", ""])
        or r.__delitem__(slice(2, 5)),  # junk where LOGRO expected
    ],
)
def test_repair_grammar_violations(mutate):
    rows = unit_rows(1)
    mutate(rows)
    with pytest.raises(ValueError):
        P.repair_units_table(rows)


@pytest.mark.parametrize(
    "trunc",
    [slice(2, 5), slice(3, 5), slice(4, 5)],  # truncation after title/comp/logro rows
)
def test_truncated_table_quarantined_downstream(trunc):
    """Pure truncation passes repair silently (reference behavior: the EOF
    raise branches need a non-matching row to trip) but fails unit
    assembly -> quarantined by parse_document."""
    rows = unit_rows(1)
    del rows[trunc]
    with pytest.raises(Exception):
        P.parse_units(rows)
    rec = P.parse_document("UG-202520_1AEL0244-8281.pdf", PAGES, rows, [])
    assert rec["error"] is not None


# ---- unit + assessment parsing ----------------------------------------------


def test_parse_units_carries_exams_and_bibliography():
    units = P.parse_units(unit_rows(2))
    assert [u["number"] for u in units] == [1, 2]
    u = units[0]
    assert u["title"] == "Álgebra 1"
    assert u["achievement"] == "resuelve sistemas"
    assert (u["initial_week"], u["last_week"]) == (1, 2)
    assert u["syllabus"] == ["t1", "t2"] and u["activities"] == ["a1"]
    # superset behavior: the reference parses these then drops them
    assert u["exams"] == ["e1"] and u["bibliography"] == ["b1"]


def test_parse_units_empty():
    assert P.parse_units([]) == []


ASSESS_ROWS = [
    ["TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE"],  # header: skipped
    ["PRÁCTICA PC - 1", "g1", "15%", "4", "", "Sí"],
    ["PRÁCTICA PC - 2", "g1", "15%", "ocho", "", "No"],  # bad week: skipped
    ["EXAMEN FINAL", "g2", "cuarenta%", "16", "", "No"],  # bad weight -> 0.0
    ["PARCIAL\n- A", "g1", "30%", "8", "", "sí"],  # newline normalize + case-insens
    ["corta", "g1", "5%"],  # <4 cells: dropped
]


def test_parse_assessments_rules():
    out = P.parse_assessments(ASSESS_ROWS)
    assert [a["name"] for a in out] == ["PRÁCTICA PC ", "EXAMEN FINAL", "PARCIAL "]
    pc1, final, parcial = out
    assert pc1["abrev"] == "1" and pc1["weight"] == 15.0 and pc1["week"] == 4
    assert pc1["is_recoverable"] is True
    assert final["abrev"] == "" and final["weight"] == 0.0  # bad weight default
    assert parcial["abrev"] == "A" and parcial["week"] == 8 and parcial["is_recoverable"] is True


def test_parse_document_quarantines_bad_filename():
    rec = P.parse_document("garbage.pdf", PAGES, [], [])
    assert rec["error"] and "filename" in rec["error"]


def test_parse_document_quarantines_bad_grammar():
    rows = unit_rows(1)
    rows[0][0] = "not a unit title"
    rec = P.parse_document("UG-202520_1AEL0244-8281.pdf", PAGES, rows, [])
    assert rec["error"] and "grammar" in rec["error"]


def test_parse_document_happy_path():
    rec = P.parse_document("UG-202520_1AEL0244-8281.pdf", PAGES, unit_rows(2), ASSESS_ROWS)
    assert rec["error"] is None
    assert rec["id"] == "1AEL0244" and rec["nrc"] == "8281" and rec["period"] == "2025-2"
    assert rec["name"] == "Matemática Básica"
    assert len(rec["units"]) == 2 and len(rec["assessments"]) == 3
