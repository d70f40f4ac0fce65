"""Weekly-calendar PDF report sink (SURVEY.md 2.1 S6).

The aggregation runs distributed (pipeline.assemble.weekly_calendar);
only the tiny per-week result is collected for rendering --
presentation, not dataflow (etl_pipeline.py:63-147). reportlab is not
in this container, so rendering is import-gated; the text renderer
below is the dependency-free fallback and the testable surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def calendar_rows(calendar_df: DataFrame) -> list[tuple[int, list[str]]]:
    """Collect the (small) aggregated calendar: [(week, [lines...])]."""
    return [(r["week"], list(r["lines"])) for r in calendar_df.collect()]


def render_text(calendar_df: DataFrame) -> str:
    """Plain-text calendar (same table the reference renders into PDF)."""
    out = ["Calendario Semanal de Evaluaciones", ""]
    rows = calendar_rows(calendar_df)
    if not rows:
        out.append("No se encontraron evaluaciones programadas.")
    for week, lines in rows:
        out.append(f"Semana {week}:")
        out.extend(f"  {line}" for line in lines)
    return "\n".join(out)


def reportlab_available() -> bool:
    try:
        import reportlab  # noqa: F401

        return True
    except ImportError:
        return False


def render_pdf(calendar_df: DataFrame, path: str) -> str:
    """PDF render via reportlab (grey header / striped rows, matching the
    reference's table style). Raises NotImplementedError without
    reportlab -- use render_text in codec-free environments."""
    if not reportlab_available():
        raise NotImplementedError(
            "reportlab is not installed; use render_text() or install reportlab"
        )
    from reportlab.lib import colors
    from reportlab.lib.pagesizes import letter
    from reportlab.lib.units import inch
    from reportlab.platypus import SimpleDocTemplate, Table, TableStyle

    rows = calendar_rows(calendar_df)
    data = [["Semana", "Contenido"]] + [[str(w), "\n".join(lines)] for w, lines in rows]
    doc = SimpleDocTemplate(path, pagesize=letter)
    table = Table(data, colWidths=[1 * inch, 5 * inch])
    table.setStyle(
        TableStyle(
            [
                ("BACKGROUND", (0, 0), (-1, 0), colors.grey),
                ("TEXTCOLOR", (0, 0), (-1, 0), colors.whitesmoke),
                ("GRID", (0, 0), (-1, -1), 1, colors.black),
                ("VALIGN", (0, 0), (-1, -1), "TOP"),
                ("ROWBACKGROUNDS", (0, 1), (-1, -1), [colors.white, colors.lightgrey]),
            ]
        )
    )
    doc.build([table])
    return path
