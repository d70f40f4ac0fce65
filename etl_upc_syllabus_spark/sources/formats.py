"""Row/format-aware sources beyond parquet: CSV, JSON-lines, ORC.

The reference reads only PDFs and per-record JSON files (SURVEY.md
2.1: 'Absent from the reference: any columnar/format-aware source');
this module standardizes the engine's non-parquet ingest/egress.

Scale rules baked in:

- **explicit schema always** -- ``inferSchema`` reads the data twice
  and samples types per-run (nondeterministic at 100 TB); a declared
  StructType makes the scan single-pass and the plan stable;
- CSV/JSON are row formats: no column pruning or predicate pushdown
  at the scan. They are ingest/egress formats here -- convert to
  parquet (or ORC) at the pipeline boundary and query that;
- ORC is columnar: pushdown and pruning work as with parquet;
- writes go through the normal partitioned writer (one file per task);
  ``coalesce(1)`` only for tiny dimension exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` as csv/json/orc/parquet at ``path`` (overwrite)."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        # header on so the file round-trips by name, not position
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_format(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Read ``path`` with a declared schema (never inferred)."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)


def roundtrip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    """Write ``df`` at ``path`` in ``fmt`` and read it back with the
    original schema -- the loss-check primitive used by tests and the
    source_format_roundtrip query."""
    write_format(df, path, fmt)
    return read_format(df.sparkSession, path, fmt, df.schema)
