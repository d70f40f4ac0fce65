"""As-of (point-in-time) join -- an operator Spark lacks natively
(SURVEY.md 2.3 'absent joins').

Composition strategy (preferred over applyInPandas/merge_asof): tag and
union both sides, sort within the key partition by (ts, side-tag), and
carry the last left-side row forward with last(..., ignorenulls) over
an unbounded-preceding frame. One shuffle on the key, no Python.

At 100 TB this is the right shape: the union is narrow, the single
window shuffle partitions by the join key, and skewed keys can be
salted before the window (each salt sees a contiguous ts subrange) --
versus merge_asof-in-pandas which caps each key at one task's memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    `on` key: the most recent with right_ts <= left_ts (``backward``,
    the default -- 'at or before', matching DuckDB ASOF JOIN) or the
    earliest with right_ts >= left_ts (``forward`` -- 'at or after').

    Both directions are the same single-shuffle composition; only the
    side-tag ordering and the window frame flip. Ties are inclusive in
    both directions: a right row at exactly left_ts matches. Returns
    all left columns plus the requested right columns (null when no
    right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # side tags order equal-ts rows so the qualifying right row falls
    # INSIDE the left row's frame: backward frames end at the current
    # row, so right (0) sorts before left (1); forward frames start at
    # the current row, so right (1) sorts after left (0).
    left_tag = 1 if direction == "backward" else 0
    lt = left.withColumn("_side", F.lit(left_tag)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(1 - left_tag))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    base = W.partitionBy(on).orderBy("_ts", "_side")
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        pick = F.last
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        pick = F.first
    carried: list[Column] = [
        pick(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols
    ]
    return (
        merged.select("*", *carried)
        .filter(F.col("_side") == left_tag)
        .drop("_side", "_ts", *[f"_r_{c}" for c in right_cols])
    )


def interval_count_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
) -> DataFrame:
    """For each left row: how many right rows lie within +/- tolerance
    of its timestamp. Returns (left_id, n_within) with 0-count rows kept.

    Scale path: a naive range join is O(|L| x |R|). Instead both sides
    are bucketed by tolerance-width time buckets -- the left row keeps
    its own bucket, each right row is replicated into the 3 buckets it
    could match (prev/own/next) -- turning the range join into an
    EQUI-join on the bucket plus an exact residual range filter. Cost
    is O(3|R|) replication and one shuffle, never a cross product; the
    same trick AQE cannot apply automatically because the range
    condition spans both sides.
    """
    tol_us = tolerance_s * 1_000_000
    lt = left.select(
        F.col(left_id).alias("_lid"),
        F.unix_micros(F.col(left_ts)).alias("_lus"),
    ).withColumn("_bucket", F.floor(F.col("_lus") / tol_us))
    rt = right.select(F.unix_micros(F.col(right_ts)).alias("_rus")).withColumn(
        "_bucket", F.explode(
            F.sequence(
                F.floor((F.col("_rus") - tol_us) / tol_us),
                F.floor((F.col("_rus") + tol_us) / tol_us),
            )
        )
    )
    hits = (
        lt.join(rt, "_bucket")
        .filter(F.abs(F.col("_lus") - F.col("_rus")) <= tol_us)
        .groupBy("_lid")
        .agg(F.count(F.lit(1)).alias("n_within"))
    )
    return (
        lt.select("_lid")
        .join(hits, "_lid", "left")
        .select(
            F.col("_lid").alias(left_id),
            F.coalesce("n_within", F.lit(0)).cast("bigint").alias("n_within"),
        )
    )
