"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``etl_upc_syllabus_spark.plans`` -- this
module only adapts the registry to the driver's three-function shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from etl_upc_syllabus_spark.plans import oracle_sql_map, queries_map
from etl_upc_syllabus_spark.session import tune

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's weekly-calendar query
    (reference etl_pipeline.py:63-147) transplanted onto the star schema:
    lineitem JOIN orders -> groupBy ISO week -> counts + exact-decimal
    revenue + sorted priority list -> ordered by week."""
    tune(spark)
    return queries_map()["flagship_weekly_calendar"](spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: _wrap(fn) for name, fn in queries_map().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-expressible query."""
    return oracle_sql_map()
