"""Robust (median/MAD) anomaly scoring shared by the batch query and
its streaming twin.

The reference statistics (per-key median and median-absolute-deviation)
are computed in BATCH over the (value, frequency) pre-aggregate -- the
exact-percentile-at-scale shape from feature_quantile_bucket -- and the
scoring itself is a stateless broadcast join + filter, so the same
`mad_flags` expression scores a bounded DataFrame or an unbounded
stream identically (train-on-batch / score-on-stream, the production
deployment pattern for metric monitors).

Determinism: medians are rounded at 6 dp, after which the score
arithmetic (abs/sub/mul/div) is IEEE-identical in both engines, so the
>3 sigma-equivalent cut has no cross-engine boundary risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_TO_SIGMA = 1.4826  # MAD -> sigma-equivalent for a normal distribution
THRESHOLD = 3.0


def _weighted_median(df: DataFrame, key: str, col: str, out: str) -> DataFrame:
    """Exact per-key median via the (value, frequency) pre-aggregate
    (bounded by the distinct domain, not the row count -- the sf10 OOM
    lesson), rounded 6 dp."""
    vc = df.groupBy(key, col).agg(F.count(F.lit(1)).alias("cnt"))
    return vc.groupBy(key).agg(
        F.round(F.expr(f"percentile({col}, 0.5D, cnt)"), 6).alias(out)
    )


def mad_reference(events: DataFrame, key: str = "event_type", col: str = "value") -> DataFrame:
    """(key, med, mad): the per-key robust location/scale reference."""
    med = _weighted_median(events, key, col, "med")
    dev = events.join(F.broadcast(med), key).select(
        key, F.abs(F.col(col) - F.col("med")).alias("d")
    )
    mad = _weighted_median(dev, key, "d", "mad")
    return med.join(mad, key)


def mad_flags(
    scored: DataFrame,
    ref: DataFrame,
    key: str = "event_type",
    col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Rows of `scored` whose value deviates > 3 sigma-equivalents from
    the per-key median. Stateless: broadcast the tiny reference, filter.
    Works identically on a batch DataFrame and a streaming one.

    Keys with mad = 0 (a majority-constant column) have no robust scale
    and are excluded up front: without the guard Spark's non-ANSI
    divide yields NULL (nothing flagged) while IEEE engines yield +inf
    (everything deviating flagged) -- a silent cross-engine divergence.
    The oracle carries the same `mad > 0` predicate."""
    score = F.abs(F.col(col) - F.col("med")) / (MAD_TO_SIGMA * F.col("mad"))
    return (
        scored.join(F.broadcast(ref.filter(F.col("mad") > 0)), key)
        .filter(score > THRESHOLD)
        .select(
            id_col,
            key,
            F.round(col, 6).alias(col),
            F.round(score, 4).alias("mad_score"),
        )
    )
