"""Pure-Python parse kernels for the syllabus document pipeline.

These run *inside* the Arrow parse stage (pipeline.assemble) -- one
document per record, exactly the per-document sequential logic that
cannot be expressed relationally (SURVEY.md 2.11). Everything here is
plain-Python testable without Spark.

Behavioral parity targets (reimplemented from observed behavior, not
copied -- citations are into /root/reference):

- filename metadata regex          etl_infrastructure.py:58-70   (P1)
- general-info section slice       etl_infrastructure.py:75-93   (P2)
- labeled-field extraction         etl_infrastructure.py:96-135  (P3/P4/F5)
- bullet splitting, both variants  etl_infrastructure.py:143-146 and
                                   etl_pipeline.py:311-314       (F1)
- units-table repair state machine etl_pipeline.py:178-219       (C1)
- unit parsing (stride 5)          etl_pipeline.py:245-264
- assessment parsing               etl_pipeline.py:266-309

Deliberate deltas from the reference (superset behavior, SURVEY 1.3):
- unit ``exams``/``bibliography`` are parsed AND carried (the reference
  parses them at etl_pipeline.py:240-241 then drops them at
  etl_infrastructure.py:219-220);
- failures return a structured error instead of log-and-None
  (quarantine philosophy, P7).
"""

from __future__ import annotations

import re
from typing import Any

FILENAME_RX = re.compile(r"^UG-(?P<period>\d{5})0_(?P<id>[A-Z0-9_\-]{8})-(?P<nrc>\d{4})\.pdf$")
GENERAL_START = "I. INFORMACIÓN GENERAL"
GENERAL_END = "II. MISIÓN Y VISIÓN"
UNIT_TITLE_RX = re.compile(r"^Unidad n\. (\d+): (.+)")
WEEK_RANGE_RX = re.compile(r"Semana\s*(\d+)\s*-\s*(\d+)")
ASSESSMENT_HEADER = ["TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE"]
AREAS_RX = re.compile(r"\n:\s*(?P<a1>[^\n]+)\nÁrea o programa[ \t]*(?P<a2>[^\n]*)\n", re.MULTILINE)

# Row-grammar markers for the units table (C1).
_MARK_TITLE = "Unidad n."
_MARK_COMPETENCIA = "COMPETENCIA (S):"
_MARK_LOGRO = "LOGRO DE LA UNIDAD:"
_MARK_SEMANA_HEADER = "SEMANA"
_MARK_SEMANA_DATA = "Semana"


def parse_filename(filename: str) -> dict[str, str]:
    """UG-{period5}0_{id8}-{nrc4}.pdf -> {id, nrc, period:'YYYY-T'}."""
    m = FILENAME_RX.match(filename)
    if not m:
        raise ValueError(f"filename does not match syllabus pattern: {filename!r}")
    period5 = m.group("period")
    return {
        "id": m.group("id"),
        "nrc": m.group("nrc"),
        "period": f"{period5[:4]}-{period5[4:]}",
    }


def split_bullets(text: str, *, include_comma: bool) -> list[str]:
    """F1 bullet split. The reference has two delimiter variants:
    comma included for general-info fields (faculty/areas), excluded for
    unit cells -- both preserved."""
    delims = "[\uf0b7•,]" if include_comma else "[\uf0b7•]"
    return [piece.strip() for piece in re.split(delims, text) if piece.strip()]


def slice_general_section(pages: list[str]) -> str:
    full = "\n".join(pages)
    start = full.find(GENERAL_START)
    if start == -1:
        return ""
    end = full.find(GENERAL_END, start)
    return full[start : end if end != -1 else len(full)]


def _label_value(section: str, label: str) -> str:
    m = re.search(rf"{label}\s*[:\-]\s*(.+)", section, re.IGNORECASE)
    return m.group(1).strip() if m else ""


def _int_or(value: str, default: int) -> int:
    try:
        return int(value)
    except (TypeError, ValueError):
        return default


def parse_general_info(pages: list[str]) -> dict[str, Any]:
    """Labeled-field extraction over the general-info slice (P2-P4, F5)."""
    section = slice_general_section(pages)
    info: dict[str, Any] = {
        "name": _label_value(section, "Nombre del Curso"),
        "id": _label_value(section, "Código del curso"),
        "period": _label_value(section, "Periodo"),
        "faculty": split_bullets(_label_value(section, "Cuerpo académico"), include_comma=True),
        "credits": _int_or(_label_value(section, "Créditos"), 0),
        "weeks": _int_or(_label_value(section, "Semanas"), 16),
        "nrc": _int_or(_label_value(section, "NRC"), 0),
    }
    m = AREAS_RX.search(section)
    if m:
        joined = m.group("a1") if not m.group("a2") else f"{m.group('a1')} {m.group('a2')}"
        info["areas"] = [a.strip() for a in joined.split(",") if a.strip()]
    else:
        info["areas"] = []
    return info


def _merge_into_previous(rows: list[list[str]], index: int) -> None:
    """Cell-wise merge of a continuation row into its predecessor."""
    if index <= 0 or index >= len(rows):
        return
    prev, curr = rows[index - 1], rows[index]
    merged = [
        (p.strip() + " " + c.strip()).strip() if c else p for p, c in zip(prev, curr)
    ]
    if len(curr) > len(prev):
        merged.extend(curr[len(prev) :])
    rows[index - 1] = merged
    del rows[index]


def repair_units_table(rows: list[list[str]]) -> list[list[str]]:
    """C1: validate the unit row grammar and merge split continuation rows.

    Expected repeating shape per unit (5 rows after repair):
      'Unidad n. N: Title' / 'COMPETENCIA (S): ...' /
      'LOGRO DE LA UNIDAD: ...' / 'SEMANA...' header / 'Semana A - B' data.

    Rows whose first cell does not open the next grammar element are
    merged cell-wise into their predecessor (PDF extraction splits tall
    cells across physical rows). Raises ValueError on grammar violations
    -- the same five failure classes as the reference
    (etl_pipeline.py:199,202,206,211,215).
    """
    out = [list(r) for r in rows]
    i = 0
    while i < len(out):
        if not out[i][0].startswith(_MARK_TITLE):
            raise ValueError(f"unit grammar: expected title row, got {out[i][0]!r}")
        i += 1
        if i < len(out) and not out[i][0].startswith(_MARK_COMPETENCIA):
            raise ValueError(f"unit grammar: expected competencia row, got {out[i][0]!r}")
        i += 1
        while i < len(out) and not out[i][0].startswith(_MARK_LOGRO):
            if i == len(out) - 1:
                raise ValueError(f"unit grammar: no achievement row before EOF ({out[i][0]!r})")
            _merge_into_previous(out, i)
        i += 1
        while i < len(out) and not out[i][0].startswith(_MARK_SEMANA_HEADER):
            if i == len(out) - 1:
                raise ValueError(f"unit grammar: no SEMANA header before EOF ({out[i]!r})")
            _merge_into_previous(out, i)
        i += 1
        if i < len(out) and not out[i][0].startswith(_MARK_SEMANA_DATA):
            raise ValueError(f"unit grammar: expected week data row, got {out[i][0]!r}")
        i += 1
        while i < len(out) and not out[i][0].startswith(_MARK_TITLE):
            _merge_into_previous(out, i)
    return out


def _parse_week_row(row: list[str]) -> dict[str, Any]:
    cells = [c.replace("\n", " ") for c in row]
    m = WEEK_RANGE_RX.match(cells[0])
    if not m:
        raise ValueError(f"invalid week range: {cells[0]!r}")
    lists = [
        split_bullets(cells[k], include_comma=False) if len(cells) > k else []
        for k in (1, 2, 3, 4)
    ]
    return {
        "initial_week": int(m.group(1)),
        "last_week": int(m.group(2)),
        "syllabus": lists[0],
        "activities": lists[1],
        "exams": lists[2],
        "bibliography": lists[3],
    }


def parse_units(rows: list[list[str]]) -> list[dict[str, Any]]:
    """Units from the repaired table: every 5 rows describe one unit."""
    if not rows:
        return []
    repaired = repair_units_table(rows)
    units = []
    for base in range(0, len(repaired), 5):
        title_m = UNIT_TITLE_RX.match(repaired[base][0])
        if not title_m:
            raise ValueError(f"invalid unit title: {repaired[base][0]!r}")
        week_info = _parse_week_row(repaired[base + 4])
        units.append(
            {
                "number": int(title_m.group(1)),
                "title": title_m.group(2),
                "achievement": repaired[base + 2][0].removeprefix(_MARK_LOGRO).strip(),
                **week_info,
            }
        )
    return units


def parse_assessments(rows: list[list[str]]) -> list[dict[str, Any]]:
    """Assessments table: header filter (P5), short-row guard (P6),
    name/code split-once (F3), %-strip weight with 0.0 default (F4),
    week skip-on-failure (F5), 'sí' recoverable flag (F6)."""
    out = []
    for raw in rows:
        if raw == ASSESSMENT_HEADER:
            continue
        cells = [c.replace("\n", " ").strip() for c in raw]
        if len(cells) < 4:
            continue
        if "-" in cells[0]:
            name, _, code = cells[0].partition("-")
        else:
            name, code = cells[0], ""
        try:
            week = int(cells[3])
        except (TypeError, ValueError):
            continue  # reference: warn-and-skip
        try:
            weight = float(cells[2].rstrip("%"))
        except (TypeError, ValueError):
            weight = 0.0  # reference: warn-and-default
        out.append(
            {
                "name": name,
                "abrev": code.strip(),
                "weight": weight,
                "week": week,
                "is_recoverable": len(cells) > 5 and "sí" in cells[5].lower(),
            }
        )
    return out


def parse_document(
    filename: str,
    pages: list[str],
    units_table: list[list[str]],
    assessments_table: list[list[str]],
) -> dict[str, Any]:
    """Whole-document parse: the kernel the Arrow stage applies per row.

    Returns the SURVEY 1.3 course record (sink field names: area, abrev,
    nrc as string) -- never raises; failures come back as
    {'error': ...} so the caller can quarantine (P7).
    """
    try:
        meta = parse_filename(filename)
        if not any(p.strip() for p in pages):
            # decode-failure marker from the extract stage (or a truly
            # empty PDF): no text means nothing downstream can parse --
            # quarantine with the filename, mirroring the reference's
            # log-and-drop of unreadable inputs (etl_pipeline.py:17-30)
            raise ValueError(f"no decodable pages in {filename}")
        info = parse_general_info(pages)
        return {
            "id": meta["id"],
            "name": info["name"],
            "period": meta["period"],
            "faculty": info["faculty"],
            "credits": info["credits"],
            "weeks": info["weeks"],
            "area": info["areas"],
            "nrc": meta["nrc"],
            "units": parse_units(units_table or []),
            "assessments": parse_assessments(assessments_table or []),
            "error": None,
        }
    except Exception as exc:  # noqa: BLE001 -- quarantine, never fail the job
        return {"id": None, "name": None, "period": None, "faculty": None,
                "credits": None, "weeks": None, "area": None, "nrc": None,
                "units": None, "assessments": None,
                "error": f"{type(exc).__name__}: {exc}"}
