"""Structured Streaming surface over the events table (SURVEY.md 2.9).

The reference is strictly batch; its re-run-to-refresh workflow
(reference README.md:82) maps to ``Trigger.AvailableNow`` incremental
processing over a source directory. This module provides the streaming
operators the blueprint adds: watermarked tumbling/sliding windows,
session windows, and within-watermark deduplication.

Batch/stream symmetry: every aggregation here is a plain DataFrame
transformation, so the same function serves the streaming path (via
``read_events_stream``) and the batch path (via the parquet loader) --
which is also how the DuckDB oracles check the streaming queries.

Scale posture: streaming state (window aggregates, dedup keys) is
partitioned by group key across executors; watermarks bound state size
-- without them a 100 TB/day stream would accumulate state forever.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEMSINK_IDS = itertools.count()

# ts is TIMESTAMP(NANOS) in the fixture parquet; Spark must read it as
# long (see sources.tables.load_table) and convert to micros.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (one file today; a
    directory files keep landing in, in production)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts+sums per event type (exact decimal sum)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_table(sliding_counts(read_events_stream(spark, sf_dir)), "complete")


def sessionized(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user: a session extends while events arrive
    within `gap` of the previous event; end = last event + gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_table(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the materialized result as a batch DataFrame.

    Memory sinks are the local-test harness; production sinks are
    kafka/parquet/foreachBatch. processAllAvailable() drains the file
    source synchronously, which is exactly the Trigger.AvailableNow
    incremental-rerun semantics of the reference's refresh loop.
    """
    name = f"strm_out_{next(_MEMSINK_IDS)}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.table(name)


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming pipeline: file stream -> tumbling windows -> memory
    sink (complete mode: every window emitted once the stream drains)."""
    return run_stream_to_table(windowed_counts(read_events_stream(spark, sf_dir)), "complete")


def stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each 'view' joined to the same user's
    'purchase' events landing within the following hour.

    Both sides carry watermarks and the join condition bounds purchase
    time relative to view time, so Spark can expire buffered state on
    both sides -- the requirements for an unbounded stream-stream join
    to run with bounded memory. At 100 TB/day the state store holds at
    most one watermark-window of each stream per user partition.
    """
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    buys = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        (F.unix_micros("buy_ts") - F.unix_micros("view_ts")).alias("delay_us"),
        "buy_value",
    )
    return run_stream_to_table(joined, "append")


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: first sighting of each (user_id, event_type) is
    emitted, duplicates within the watermark are dropped. State is
    bounded by the watermark -- the scale-safe streaming dedup."""
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_table(deduped, "append")
