"""Overwrite-semantics posture (r13 axis, tools/overwrite_probe.py).

Pinned AS MEASURED: static partition overwrite (the Spark DEFAULT) is
silent full-table data loss for incremental loads; the per-write
dynamic option scopes the delete to the partitions in the batch; a
read racing an overwrite is loud on the fail-fast path but returns 0
rows SILENTLY on the resilient path (ignoreMissingFiles resolves every
vanished file to nothing).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_upc_syllabus_spark.pipeline import sinks
from etl_upc_syllabus_spark.sources.formats import read_resilient


def _seed(spark, d):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "v int, p string"
    ).write.mode("overwrite").partitionBy("p").parquet(d)


def test_static_partition_overwrite_is_silent_data_loss(spark, tmp_path):
    d = str(tmp_path / "t")
    _seed(spark, d)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "STATIC"
    spark.createDataFrame([(20, "b")], "v int, p string").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(d)
    # partition a is GONE -- no error anywhere
    assert sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    ) == [("b", 20)]


def test_dynamic_per_write_option_scopes_the_delete(spark, tmp_path):
    d = str(tmp_path / "t")
    _seed(spark, d)
    spark.createDataFrame([(20, "b")], "v int, p string").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("p").parquet(d)
    assert sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    ) == [("a", 1), ("b", 20)]
    # per-WRITE option: the session conf was never mutated
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "STATIC"


def test_write_courses_period_incremental(spark, tmp_path):
    """The shipped incremental writer: refreshes only the periods in
    the batch, gates the period key like the full writer."""
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra"), ("C2", "2025-2", "Física I")],
        "id string, period string, name string",
    )
    sinks.write_courses_parquet(df, base)

    refresh = spark.createDataFrame(
        [("C2", "2025-2", "Física I (rev)"), ("C3", "2025-2", "Química")],
        "id string, period string, name string",
    )
    sinks.write_courses_period_incremental(refresh, base)
    back = {
        (r["id"], r["period"]): r["name"]
        for r in sinks.read_courses(spark, base).collect()
    }
    # 2025-1 untouched; 2025-2 fully replaced by the batch
    assert back == {
        ("C1", "2025-1"): "Algebra",
        ("C2", "2025-2"): "Física I (rev)",
        ("C3", "2025-2"): "Química",
    }

    # the same gate as the full writer
    hostile = spark.createDataFrame(
        [("C4", "", "X")], "id string, period string, name string"
    )
    with pytest.raises(ValueError, match="empty_string"):
        sinks.write_courses_period_incremental(hostile, base)


def test_read_racing_overwrite_loud_vs_silent(spark, tmp_path):
    """The composition trap: fail-fast dies loudly on the stale file
    index; read_resilient returns 0 rows with no error."""
    d = str(tmp_path / "t")
    spark.range(100).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    failfast = spark.read.parquet(d)
    resilient = read_resilient(
        spark, d, T.StructType([T.StructField("v", T.LongType())])
    )
    assert failfast.count() == 100 and resilient.count() == 100

    spark.range(5).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    with pytest.raises(Exception, match="FILE_NOT_EXIST|FAILED_READ_FILE"):
        failfast.count()
    assert resilient.count() == 0  # SILENT total loss, pinned as measured
