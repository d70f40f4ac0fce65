"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md 2.9/2.10: the arbitrary-state seam Spark offers beyond
built-in window aggregations).

The operator keeps a per-user running (count, cents-sum) state across
micro-batches and emits the updated totals each batch. Values are
accumulated as integer cents so the state is exact and the output is
oracle-checkable (float state would drift per accumulation order).

Scale posture: state lives in the state store partitioned by group
key; with N executors each holds |users|/N entries. A production
deployment adds a timeout (state eviction) -- wired here as
NoTimeout because the fixture is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import read_events_stream, run_stream_to_table

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint"


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # exact integer cents; value column is 2-decimal by fixture contract
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful stream to completion; with the bounded fixture
    (one file -> one micro-batch) each user emits exactly one final row,
    so the result equals the batch groupBy -- the oracle."""
    out = run_stream_to_table(running_user_totals(read_events_stream(spark, sf_dir)), "update")
    # keep the latest emission per user (robust if the source ever
    # splits into multiple micro-batches)
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_cents").alias("total_cents"))
    )
