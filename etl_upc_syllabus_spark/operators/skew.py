"""Skew-mitigation operators (SURVEY.md 'Optimize for scale').

At 100 TB a single hot key (one viral document, one mega-customer) can
pin an entire join or aggregation on one executor. Two mitigations,
composable and semantics-preserving:

- **AQE skew-join splitting** is on by default in ``session.get_spark``
  (`spark.sql.adaptive.skewJoin.enabled`) -- handles skewed *shuffled*
  joins with no code changes.
- **Salted join** (this module) for the cases AQE can't re-plan: the
  left (large, skewed) side is salted into N shards; the right side is
  replicated N ways via an explode -- so one hot key spreads across N
  tasks. Use when the right side is too big to broadcast and the skew
  is known/extreme.
- **Two-phase aggregation**: partial agg on (key, salt), final agg on
  key -- spreads a hot group's partial work over N tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): spreads hot keys.

    Uses a hash of all columns rather than rand() so results (and
    tests) are reproducible across retries -- important for exactly-once
    sinks where task retries must not re-shuffle rows differently.
    """
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def replicate(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate every row n_salts times (the small/right side of a
    salted join)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed large side salted into n_salts shards.

    `on` is the ordinary join condition; the salt equality is added on
    top. For how in {'inner', 'left'} semantics are identical to
    large.join(small, on, how): each large row carries exactly one salt
    and meets exactly one replica of each matching small row. Other
    join types are rejected: the small side is replicated n_salts
    times, so 'right'/'full' would emit each unmatched small row once
    per replica, and semi/anti flip which side survives.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner', 'left'}}, got {how!r}: "
            "the replicated right side breaks right/full/semi/anti semantics"
        )
    left = salted(large, n_salts, "_salt_l")
    right = replicate(small, n_salts, "_salt_r")
    return (
        left.join(right, on & (F.col("_salt_l") == F.col("_salt_r")), how)
        .drop("_salt_l", "_salt_r")
    )


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof sum: partial sum per (key, salt), final sum per key.

    Spark already does map-side partial aggregation; the explicit salt
    phase additionally splits a hot key's *reduce* work across n_salts
    tasks -- the difference matters when one group holds a large share
    of all rows.
    """
    partial = (
        salted(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("total"))
