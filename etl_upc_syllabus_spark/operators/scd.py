"""Slowly-changing-dimension type-2 merge (warehouse upsert semantics).

The MERGE INTO shape lakehouse tables provide, expressed as pure
DataFrame ops so it runs on any source: apply a batch of attribute
updates to a versioned dimension, closing the previous version of each
changed row and opening a new one, while no-op updates (same attribute
values) and untouched keys pass through unchanged.

No reference analog (the reference pipeline is stateless per run,
etl_pipeline.py); this extends the relational surface the same way the
streaming module extends its refresh loop.

Scale: one equi-join of the open slice with the update batch on the
business key plus one anti-join -- both shuffle on the key once; when
the update batch is small relative to the dimension (the common case)
Spark broadcasts it and the dimension is never shuffled at all. The
closed-history slice is untouched by either join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "9999-12-31"


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_date: str,
) -> DataFrame:
    """Apply `updates` (key + new attr values, effective `eff_date`) to
    a versioned dimension `current` (key, attrs, valid_from, valid_to,
    is_current).

    Returns the merged dimension:
    - rows whose key is absent from the batch, or whose update is a
      no-op (every attr equal): unchanged;
    - changed rows: the open version closed at `eff_date`
      (is_current=0) plus a new open version carrying the updated
      attrs from `eff_date`.
    Closed-history rows (is_current=0) always pass through.
    """
    upd = updates.select(
        F.col(key), *[F.col(a).alias(f"_new_{a}") for a in attrs]
    )
    open_rows = current.filter(F.col("is_current") == 1)
    differs = None
    for a in attrs:
        d = F.col(a) != F.col(f"_new_{a}")
        differs = d if differs is None else (differs | d)
    changed = open_rows.join(F.broadcast(upd), key).filter(differs)

    closed = changed.select(
        key,
        *attrs,
        "valid_from",
        F.lit(eff_date).alias("valid_to"),
        F.lit(0).cast("long").alias("is_current"),
    )
    opened = changed.select(
        key,
        *[F.col(f"_new_{a}").alias(a) for a in attrs],
        F.lit(eff_date).alias("valid_from"),
        F.lit(END_OF_TIME).alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    # anti-join on (key, is_current=1): a changed key's open row is
    # replaced, but its closed-history rows must survive
    untouched = current.join(
        changed.select(key).withColumn("is_current", F.lit(1).cast("long")),
        on=[key, "is_current"],
        how="left_anti",
    )
    cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return untouched.select(cols).unionByName(closed.select(cols)).unionByName(
        opened.select(cols)
    )


def cdc_apply(
    log: DataFrame,
    key: str,
    seq: str,
    op: str = "op",
) -> DataFrame:
    """Compact a CDC change log into the latest snapshot per key.

    The log-compaction half of every lakehouse MERGE / Hudi
    copy-on-write / Delta CDF apply: each key keeps only its
    highest-``seq`` entry, and a key whose latest entry is a delete
    ('D') vanishes from the snapshot. Upserts ('U'/'I') carry their
    payload columns through.

    Plan: one hash shuffle on the key for the per-key top-1 window
    (rank by seq desc; at 100 TB the log is already bucketed by key in
    any sane layout, making even that exchange free). No join against
    the base table is needed because a compacted log IS the table --
    callers holding an older snapshot union it in as 'I' entries with
    seq below the log's range.
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy(key).orderBy(F.col(seq).desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col(op) != "D").drop(op)
