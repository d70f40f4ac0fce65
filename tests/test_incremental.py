"""Trigger.AvailableNow incremental ETL: each run processes only files
that arrived since the previous run (checkpointed file-source log),
unlike the reference's full recompute per refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from etl_upc_syllabus_spark.streaming.incremental import incremental_run

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", DoubleType())]
)


def _write_batch(spark, path: str, start: int, n: int) -> None:
    spark.createDataFrame([(i, float(i)) for i in range(start, start + n)], SCHEMA).write.mode(
        "append"
    ).parquet(path)


def test_incremental_processes_only_new_files(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    double_v = lambda df: df.withColumn("v2", F.col("v") * 2)

    _write_batch(spark, src, 0, 100)
    n1 = incremental_run(spark, src, sink, ckpt, SCHEMA, double_v)
    assert n1 == 100
    assert spark.read.parquet(sink).count() == 100

    _write_batch(spark, src, 100, 50)
    n2 = incremental_run(spark, src, sink, ckpt, SCHEMA, double_v)
    assert n2 == 50  # only the new file, not a recompute
    out = spark.read.parquet(sink)
    assert out.count() == 150
    assert out.agg(F.max("id")).collect()[0][0] == 149
    assert out.filter(F.col("v2") != F.col("v") * 2).count() == 0

    # nothing new -> a run is a no-op, sink unchanged
    n3 = incremental_run(spark, src, sink, ckpt, SCHEMA, double_v)
    assert n3 == 0
    assert spark.read.parquet(sink).count() == 150
