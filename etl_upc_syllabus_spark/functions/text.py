"""Column-level scalar function battery (SURVEY.md 2.8).

Spark Column builders for the reference's F-class functions where they
are needed *outside* the per-document parse UDF -- all JVM-side
higher-order functions, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1's two delimiter variants (etl_infrastructure.py:146 includes the
# comma; etl_pipeline.py:314 does not)
BULLET_DELIMS_WITH_COMMA = "[•,]"
BULLET_DELIMS = "[•]"


def bullet_split(col: Column | str, *, include_comma: bool = False) -> Column:
    """F1 as a column function: split on bullets, trim, drop empties."""
    col = F.col(col) if isinstance(col, str) else col
    pattern = BULLET_DELIMS_WITH_COMMA if include_comma else BULLET_DELIMS
    # NB: must be a single-arg lambda -- F.trim passed bare would be called
    # by transform as (element, index) (trim gained a 2nd param in Spark 4),
    # silently trimming index digits instead of whitespace.
    return F.filter(
        F.transform(F.split(col, pattern), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def normalize_ws(col: Column | str) -> Column:
    """F2 generalized: newline/whitespace normalization."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def chunk_starts(length: Column, width: int, stride: int) -> Column:
    """1-based start offsets for overlapping fixed-width chunks."""
    return F.sequence(F.lit(1), F.greatest(length - (width - 1), F.lit(1)), F.lit(stride))
