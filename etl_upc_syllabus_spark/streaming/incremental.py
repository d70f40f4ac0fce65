"""Incremental file-arrival ETL: the reference's rerun-to-refresh loop
(reference README.md:82 -- "if you add new syllabi, run the script
again", i.e. full recompute) re-expressed as Structured Streaming with
``Trigger.AvailableNow`` + a checkpoint.

Each invocation drains exactly the files that arrived since the last
run (the checkpoint's file-source log remembers what was processed),
appends the transformed rows to the sink, and exits. At 100 TB this is
the difference between an O(corpus) recompute per refresh and an
O(new data) one; the checkpoint also gives exactly-once sink semantics
for the parquet writer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def incremental_run(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> int:
    """Process files that arrived in `source_dir` since the last run.

    Returns the number of input rows processed by THIS run (0 when
    nothing new arrived). Streaming file sources require an explicit
    schema -- inference would need a listing per run.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(int(p["numInputRows"]) for p in (q.recentProgress or []))
