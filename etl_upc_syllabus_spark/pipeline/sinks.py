"""Sinks + point reads for the course corpus (SURVEY.md 2.1 S4-S8).

The scale-correct persistent form is Parquet partitioned by period
(predicate pushdown + partition pruning for the period/point reads);
the JSON writers exist for reference-contract parity:

- S4 per-record JSON files named '{name}-{nrc}.json' -- an anti-pattern
  at scale (millions of tiny driver-written files), kept as a compat
  writer;
- S5 one consolidated JSON array ('all_courses.json', the downstream
  contract of reference prompt_format.txt:9).

Reference bugs fixed rather than reproduced (SURVEY 7 'faithful-vs-
fixed'): find_by_id globbed '{id}_*.json' which can never match S4's
'{name}-{nrc}.json' filenames (etl_infrastructure.py:160-166), and
find_by_period was a stub returning [] (etl_infrastructure.py:168-170).
Both are real queries here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COURSES_DIRNAME = "courses_parquet"


def write_courses_parquet(courses: DataFrame, base_path: str) -> str:
    """The scale path: parquet partitioned by period."""
    out = os.path.join(base_path, COURSES_DIRNAME)
    courses.write.mode("overwrite").partitionBy("period").parquet(out)
    return out


def write_per_record_json(courses: DataFrame, base_path: str) -> list[str]:
    """S4 compat: one pretty-printed JSON file per course, named
    '{name}-{nrc}.json' (etl_infrastructure.py:153-158). Collects to the
    driver by design -- only valid for reference-sized corpora."""
    os.makedirs(base_path, exist_ok=True)
    written = []
    for row in courses.toJSON().collect():
        rec = json.loads(row)
        fname = f"{rec.get('name') or 'unknown'}-{rec.get('nrc') or 'no-nrc'}.json"
        path = os.path.join(base_path, fname)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(rec, fh, ensure_ascii=False, indent=2)
        written.append(path)
    return written


def write_all_courses_json(courses: DataFrame, base_path: str) -> str:
    """S5 compat: single consolidated JSON array (the reference's
    all_courses.json contract, etl_pipeline.py:52-61)."""
    os.makedirs(base_path, exist_ok=True)
    path = os.path.join(base_path, "all_courses.json")
    records = [json.loads(r) for r in courses.toJSON().collect()]
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(records, fh, ensure_ascii=False, indent=4)
    return path


def read_courses(spark: SparkSession, base_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_path, COURSES_DIRNAME))


def find_by_id(spark: SparkSession, base_path: str, course_id: str) -> DataFrame:
    """S7, fixed: point read with pushdown instead of a filename glob
    that never matched (see module docstring)."""
    return read_courses(spark, base_path).filter(F.col("id") == course_id).limit(1)


def find_by_period(spark: SparkSession, base_path: str, period: str) -> DataFrame:
    """S8, implemented: partition-pruned period scan (the parquet layout
    makes this a single-directory read)."""
    return read_courses(spark, base_path).filter(F.col("period") == period)
