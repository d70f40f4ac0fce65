"""PySpark-native analytics engine with the query and data-processing
capabilities of remgo696/ETL-UPC-Syllabus, re-expressed Spark-first.

Layout (SURVEY.md section 7):

- ``session``    -- SparkSession builder tuned for local[32] test runs.
- ``sources``    -- parquet star-schema loaders, binary document source,
                    JSON sinks (reference etl_infrastructure.py:153-170).
- ``functions``  -- the scalar-function battery F1-F12 (SURVEY section 2.8)
                    as reusable Column builders.
- ``operators``  -- dedup / similarity / text-analysis / multimodal /
                    as-of-join operators (LLM-data-pipeline extension).
- ``plans``      -- the query registry: every SURVEY section 2 operator as a
                    (spark, sf_dir) -> DataFrame callable plus its DuckDB
                    oracle SQL.
- ``pipeline``   -- the syllabus document pipeline (reference parity:
                    parse state machine, nested course schema, sinks).
- ``streaming``  -- Structured Streaming surface over the events table.
"""

__version__ = "0.1.0"
