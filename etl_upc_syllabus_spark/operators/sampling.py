"""Deterministic dataset splitting and sampling for corpus curation.

A training-data pipeline needs train/val/test assignment and
per-stratum downsampling that are (a) reproducible across runs and
engines, (b) stable under repartitioning, and (c) computable without a
shuffle. Spark's ``df.sample`` / ``sampleBy`` are none of these: they
are partition-order-dependent and seed-but-not-content deterministic.
We instead hash the record id (salted md5 -> first 8 hex chars as
BIGINT, the same portable hash family used by operators.dedup) into
buckets and assign by threshold -- a pure per-row projection, so it
fans out embarrassingly at 100 TB, survives repartitioning, and a
record's split never changes when the corpus grows.

The reference has no sampling surface (it processes every PDF it
finds, reference etl_pipeline.py:32-50); this extends the engine for
the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, buckets: int, salt: str) -> Column:
    """Deterministic bucket in [0, buckets) from a salted content hash.

    Portable across engines: md5 of the id's decimal string plus salt,
    first 8 hex chars as an integer (DuckDB mirror:
    plans/_fragments.hex8_value). conv() stays in whole-stage codegen.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"), F.lit("#" + salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    buckets: int = 100,
) -> DataFrame:
    """Assign every row a split label with the given weight fractions.

    Weights are cumulated into integer bucket thresholds, so e.g.
    {train: .8, val: .1, test: .1} maps buckets [0,80) / [80,90) /
    [90,100). Adding data never moves an existing row between splits.
    """
    b = hash_bucket(id_col, buckets, salt)
    expr: Column | None = None
    edge = 0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        edge += int(round(w * buckets))
        cond = b < F.lit(edge)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", label)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    salt: str = "sample",
    buckets: int = 1000,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    The downsampling shape of corpus curation (e.g. cap an
    over-represented language): per-row hash-threshold test, no
    shuffle, no state. Rates are rounded to 1/buckets granularity so
    the kept set is exact and engine-portable.
    """
    b = hash_bucket(id_col, buckets, salt)
    thr: Column = F.lit(int(round(default_rate * buckets)))
    for value, rate in rates.items():
        thr = F.when(F.col(stratum_col) == value, int(round(rate * buckets))).otherwise(thr)
    return df.withColumn("_keep", b < thr).where(F.col("_keep")).drop("_keep")


def rebalance_mixture(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    id_col: str,
    salt: str = "mixture",
    buckets: int = 1000,
) -> DataFrame:
    """Downsample strata so the output matches target mixture weights.

    The data-mixing step of a pretraining pipeline: given integer
    percentage ``weights`` (summing to 100), find the largest output
    size reachable without upsampling any stratum (water-filling:
    ``n_out = min_s(count_s * 100 div w_s)``), derive one keep-threshold
    per stratum, and hash-filter. All threshold math is BIGINT integer
    division so a SQL oracle reproduces it exactly -- no float rounding
    seam between engines.

    Shape at scale: one tiny per-stratum count agg, a scalar min, and a
    broadcast join of the (stratum, threshold) table back onto the
    corpus scan -- the full data is never shuffled.
    """
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    spark = df.sparkSession
    w = spark.createDataFrame(list(weights.items()), f"{stratum_col} string, _w long")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n")).join(w, stratum_col)
    n_out = counts.select(F.min(F.expr("_n * 100 DIV _w")).alias("_n_out"))
    thr = (
        counts.crossJoin(F.broadcast(n_out))
        .withColumn("_thr", F.expr(f"({buckets} * ((_n_out * _w) DIV 100)) DIV _n"))
        .select(stratum_col, "_thr")
    )
    b = hash_bucket(id_col, buckets, salt)
    return (
        df.join(F.broadcast(thr), stratum_col)
        .where(b < F.col("_thr"))
        .drop("_thr")
    )
